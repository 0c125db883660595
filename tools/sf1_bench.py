"""10x-scale (sf1) bench leg: catch superlinear plans the replicated
dataprep harness can't see, per the round-4 verdict.

Builds a deterministic sf1 dataset (10x the sf0.1 tables) and times the
most expensive TABLE-BACKED gate queries at both scales with bench.py's
steady-state protocol (min of N iters, cache cleared per iter). The
t(sf1)/t(sf0.1) ratio should be <~10x modulo fixed overheads; anything
well beyond 10x flags a plan term that grows faster than rows.

Scaling construction (all pure column math, fully deterministic):

- documents: replica r prefixes every word with ``r{r}`` and offsets
  doc_id by r*10^7 (the dataprep_scale_bench trick — replicas share no
  shingles/fingerprints, so duplicate structure and near-dup pair counts
  grow exactly linearly); n_chars recomputed from the new text.
- embeddings: replica r multiplies dimension i by a deterministic +-1
  sign, ``1 - 2*pmod(hash(i, r), 2)`` (identity for r=0). A sign flip
  preserves norms and all WITHIN-replica inner products bit-exactly, so
  each replica reproduces the base corpus's neighbor structure, while
  cross-replica cosines are pseudo-random (no replica-pair dup blowup).
- events: replica r offsets event_id by r*10^7; timestamps/users are
  kept, so the time range holds and per-user/per-window group sizes
  grow 10x — the density regime a 10x bigger day of telemetry has.

Exemptions (documented in BENCH.md): streaming-harness queries (wall is
query lifecycle, not data), fixed-size-generator gates (scaled by the
dataprep token-scale table instead), and fixed-subset gates like
doc_containment (read a pinned id range by construction).

Usage: python tools/sf1_bench.py [--scale 10] [--iters 2]
Writes /tmp/sf1_bench.json and prints a markdown table for BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from vector_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"

QUERIES = [
    "doc_curation_pipeline",
    "doc_winnow_dups",
    "checkpointed_resume",
    "emb_near_dups_lsh",
    "doc_hybrid_rrf",
    "doc_cluster_reps",
    "emb_lsh_recall",
    "cfg_curation",
    "doc_dup_clusters",
    "doc_incremental_near_dup",
]


def build_sf1(spark, scale: int) -> None:
    if os.path.exists(f"{SF1}/_BUILT_x{scale}"):
        return
    reps = spark.range(scale).withColumnRenamed("id", "__r")

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    text = F.when(F.col("__r") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("r"), F.col("__r").cast("string"), F.lit("$1")),
        )
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__r") * 10_000_000).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    r = F.col("__r")
    signed = F.transform(
        "embedding",
        lambda x, i: x * (
            F.lit(1) - F.lit(2) * F.pmod(F.hash(i, r), F.lit(2))
        ).cast("float"),
    )
    flipped = F.when(r == 0, F.col("embedding")).otherwise(signed)
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            flipped.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/embeddings.parquet")
    )

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("__r") * 10_000_000).alias(
                "event_id"
            ),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/events.parquet")
    )

    # TPC-H: facts (orders, lineitem) x scale with matching orderkey
    # offsets; dimensions stay 1x — customers get scale x the orders,
    # parts/suppliers scale x the lineitems. That is the realistic
    # scale-up regime (fact growth against stable dims) and keeps every
    # fact->dim join's referential integrity intact.
    okey_off = F.col("__r") * 10_000_000
    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    (
        orders.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + okey_off).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/orders.parquet")
    )
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + okey_off).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/lineitem.parquet")
    )
    for dim in ("customer", "supplier", "part", "nation", "region"):
        spark.read.parquet(f"{SF01}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{dim}.parquet")
    open(f"{SF1}/_BUILT_x{scale}", "w").write("ok\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--queries", default="", help="comma list; empty = all")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q] or QUERIES

    spark = get_spark("sf1_bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark, args.scale)

    import __spark_entry__ as entry

    results: dict[str, dict] = {}
    for name in names:
        fn = entry._QUERIES[name]
        row = {}
        for tag, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            best, rows = float("inf"), 0
            for it in range(args.iters + 1):  # +1 warmup
                spark.catalog.clearCache()
                t0 = time.monotonic()
                rows = fn(spark, sf_dir).count()
                dt = time.monotonic() - t0
                if it:
                    best = min(best, dt)
            row[tag] = {"wall_s": round(best, 3), "rows_out": rows}
            print(f"{name:<28} {tag:<6} {best:7.2f}s out={rows}", flush=True)
        row["ratio"] = round(row["sf1"]["wall_s"] / row["sf0.1"]["wall_s"], 2)
        results[name] = row

    lines = [
        "| query | sf0.1 wall (s) | sf1 wall (s) | t ratio | out sf0.1 -> sf1 |",
        "|---|---|---|---|---|",
    ]
    for name, row in results.items():
        lines.append(
            f"| {name} | {row['sf0.1']['wall_s']} | {row['sf1']['wall_s']} "
            f"| **{row['ratio']}** | {row['sf0.1']['rows_out']}->"
            f"{row['sf1']['rows_out']} |"
        )
    print("\n".join(lines))
    with open("/tmp/sf1_bench.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
