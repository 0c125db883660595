"""Shuffle-skew diagnostic for a prospective groupBy/join key.

Usage:
    python tools/skew_report.py <parquet_path_or_dir> <key_col> [sample_col]

Before keying a 10^12-row shuffle on a column, this prints the evidence
that decides between a plain groupBy, AQE skew-join, and explicit
salting (operators/skew.py): approximate distinct keys (HLL), the exact
shares of the dominant keys (two-phase heavy hitters — the shuffle here
is bounded by the candidate set, so the diagnostic itself is safe to run
on the full table), and the max-key share vs the 1/parallelism budget.

Rule of thumb printed at the end: a single key holding more than a few
multiples of 1/shuffle-partitions of the rows will straggle its reducer;
salt that key (salted_agg) or rely on AQE skew-join splitting for joins.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark.operators.heavy_hitters import heavy_hitters
from vector_spark.session import get_spark


def report(spark, path: str, key: str, sample_col: str | None = None) -> dict:
    df = spark.read.parquet(path)
    if sample_col is None:
        # data-derived, key-independent residue source (same posture as
        # skew.py salts): hash of the whole row minus the key
        others = [c for c in df.columns if c != key] or [key]
        df = df.withColumn("__probe", F.xxhash64(*others))
        sample_col = "__probe"
    n = df.count()
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_keys = df.agg(F.approx_count_distinct(key, rsd=0.02).alias("d")).collect()[0].d
    hot = heavy_hitters(
        df, key, min_share=1.0 / max(parts, 1) / 2, sample_col=sample_col
    ).limit(10).collect()
    top_share = hot[0].share if hot else 0.0
    return {
        "rows": n,
        "approx_distinct_keys": n_keys,
        "shuffle_partitions": parts,
        "even_share": round(1.0 / parts, 6),
        "hot_keys": [(r.key, r.n_rows, r.share) for r in hot],
        "max_key_share": top_share,
        "skew_ratio": round(top_share * parts, 2),
        "recommendation": (
            "salt this key (operators/skew.salted_agg) or enable AQE skew join"
            if top_share * parts > 4
            else "plain groupBy/join is fine (no reducer holds >4x even share)"
        ),
    }


def main() -> int:
    path, key = sys.argv[1], sys.argv[2]
    sample_col = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark("skew_report")
    rep = report(spark, path, key, sample_col)
    for k, v in rep.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
