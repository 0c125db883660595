"""Per-query bench regression report: compare a fresh bench.py JSON
against a previous round's record and print queries slower than
``--ratio`` (default 1.5×) with wall time above ``--floor`` (default
0.5 s) — the round-verdict criterion. Exit code = number of flagged
regressions, so the end-of-round chain can gate on it.

Remember this VM's documented ±40% per-run band: re-measure a flagged
query warm (3-4 iters) before treating it as a real regression; code
that did not change does not regress, machines do.

Usage:
  python bench.py > /tmp/bench_new.json
  python tools/bench_compare.py /tmp/bench_new.json BENCH_r03.json
"""

from __future__ import annotations

import argparse
import json


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver-recorded BENCH_r{N}.json wrapper
        doc = doc["parsed"]
    return doc.get("queries", {})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("old")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()
    new, old = load_queries(args.new), load_queries(args.old)

    regs, imps = [], []
    for name, t in sorted(new.items()):
        if name not in old:
            continue
        if t > args.floor and t > args.ratio * old[name]:
            regs.append((name, old[name], t))
        elif old[name] > args.floor and old[name] > args.ratio * t:
            imps.append((name, old[name], t))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    print(f"queries: {len(new)} (was {len(old)}; +{len(added)} new, "
          f"-{len(removed)} removed)")
    print(f"total wall: {sum(new.values()):.1f} s (was "
          f"{sum(old.values()):.1f} s over the old set)")
    worst = max(new.items(), key=lambda kv: kv[1]) if new else ("-", 0)
    print(f"worst query: {worst[0]} {worst[1]:.2f} s")
    if added:
        print("new queries:", ", ".join(f"{n} {new[n]:.2f}s" for n in added))
    for name, a, b in sorted(imps, key=lambda r: r[1] / r[2], reverse=True):
        print(f"IMPROVED {name}: {a:.2f} -> {b:.2f} ({a / b:.1f}x)")
    for name, a, b in sorted(regs, key=lambda r: r[2] / r[1], reverse=True):
        print(f"REGRESSION {name}: {a:.2f} -> {b:.2f} ({b / a:.1f}x)")
    print(f"{len(regs)} regressions > {args.ratio}x above {args.floor}s")
    return len(regs)


if __name__ == "__main__":
    raise SystemExit(main())
