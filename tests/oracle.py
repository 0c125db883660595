"""Independent pandas oracle for the sequences generator and the flagship
pipeline (FIXTURES.md F4). Deliberately written row-at-a-time / plain pandas
— NOT by calling the Spark implementation — so it is a true second opinion.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

SOURCES = [
    ("app", 45), ("web", 65), ("db", 75), ("cache", 83),
    ("auth", 90), ("batch", 95), ("edge", 98), ("misc", 100),
]
STATUSES = [200, 200, 301, 404, 500]
EPOCH = datetime(2024, 1, 1)
ENRICH = {
    "app": ("team-0", 1, "us"), "web": ("team-1", 2, "eu"),
    "db": ("team-2", 3, "ap"), "cache": ("team-3", 1, "us"),
    "auth": ("team-0", 2, "eu"), "batch": ("team-1", 3, "ap"),
    "edge": ("team-2", 1, "us"), "misc": ("team-3", 2, "eu"),
}


def _source(i: int) -> str:
    u = (i * 2654435761) % 100
    for name, hi in SOURCES:
        if u < hi:
            return name
    raise AssertionError


def oracle_sequences(n: int) -> pd.DataFrame:
    rows = []
    for i in range(n):
        n_tok = 16 + i % 241
        rows.append(
            {
                "doc_id": f"doc-{i:012d}",
                "tokens": [(i * 1_000_003 + j * 7919) % 50257 for j in range(n_tok)],
                "n_tok": n_tok,
                "source": _source(i),
                "_i": i,
            }
        )
    return pd.DataFrame(rows)


def oracle_pipeline(n: int) -> dict[str, pd.DataFrame]:
    """The full parse→enrich→route→aggregate oracle."""
    seq = oracle_sequences(n)
    routed_rows, agg = [], {}
    for _, r in seq.iterrows():
        i = r["_i"]
        ts = EPOCH + timedelta(seconds=int(i % 86400))
        status = STATUSES[i % 5]
        team, tier, region = ENRICH[r["source"]]
        routes = []
        if status >= 400:
            routes.append("errors")
        if status >= 500 and tier == 1:
            routes.append("alerts")
        if 300 <= status < 400:
            routes.append("redirects")
        if status < 300:
            routes.append("ok")
        if not routes:
            routes = ["_unmatched"]
        win = ts - timedelta(seconds=ts.timestamp() % 60)
        for route in routes:
            routed_rows.append(
                {
                    "route": route,
                    "doc_id": r["doc_id"],
                    "toks": ",".join(str(t) for t in r["tokens"]),
                }
            )
            key = (route, r["source"], team, win.strftime("%Y-%m-%d %H:%M:%S"))
            cur = agg.setdefault(key, {"events": 0, "tokens_total": 0})
            cur["events"] += 1
            cur["tokens_total"] += r["n_tok"]
    agg_df = pd.DataFrame(
        [
            {
                "route": k[0], "source": k[1], "team": k[2], "ws": k[3],
                "events": v["events"], "tokens_total": v["tokens_total"],
            }
            for k, v in agg.items()
        ]
    )
    return {"routed": pd.DataFrame(routed_rows), "agg": agg_df}
