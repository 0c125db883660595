"""North-rule scaling evidence: run the identical pipeline job on the
identical input at N and 4N parallelism (local[8] vs local[32] — the sandbox
substitute for N vs 4N executors), report throughput at both + scaling
efficiency, and write BENCH.md.

Usage: python tools/scaling_bench.py [--rows 2000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from datetime import datetime, timezone

REPO = "/root/repo"


def run_bench(cpus: int, rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, f"{REPO}/bench.py", "--cpus", str(cpus),
         "--rows", str(rows), "--skip-queries", "--iters", "4"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench --cpus {cpus} produced no JSON: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--n", type=int, default=2, help="small parallelism (4N = 4*n)")
    args = ap.parse_args()

    small = run_bench(args.n, args.rows)
    big = run_bench(args.n * 4, args.rows)
    tp_small, tp_big = small["seq_per_sec"], big["seq_per_sec"]
    eff = (tp_big / tp_small) / 4

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""# BENCH — scaling evidence (N vs 4N)

Per BASELINE.json north rule: the identical parse→enrich→route→aggregate
job on the identical materialized input table at two parallelism levels
(sandbox substitute for N vs 4N executors; see BASELINE.md §4).

Run {stamp}, input = {args.rows:,} sequences (materialized parquet, the
Iceberg-scan stand-in), steady-state (min of 3 iters, JVM warm).

| parallelism | wall time (s) | sequences/sec |
|---|---|---|
| local[{args.n}] (N) | {small['value']} | {tp_small:,} |
| local[{args.n * 4}] (4N) | {big['value']} | {tp_big:,} |

**Scaling efficiency (N→4N) = ({tp_big:,} / {tp_small:,}) / 4 = {eff:.2f}**
(north-rule threshold: ≥ 0.8)

Raw: N iters {small['iters_sec']}, 4N iters {big['iters_sec']}.
"""
    # preserve hand-written analysis below the marker across re-runs
    marker = "<!-- analysis -->"
    tail = ""
    try:
        old = open(f"{REPO}/BENCH.md").read()
        if marker in old:
            tail = marker + old.split(marker, 1)[1]
    except FileNotFoundError:
        pass
    with open(f"{REPO}/BENCH.md", "w") as f:
        f.write(md + "\n" + tail)
    print(json.dumps({"n_seq_per_sec": tp_small, "4n_seq_per_sec": tp_big,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
