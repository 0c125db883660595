"""Dataprep scale-linearity evidence: run the near-dup/dedup family on
deterministically scaled corpora (1×, 4×, 16× the sf0.1 documents table)
and report the empirical scaling exponent of each operator,
log(t_hi/t_lo) / log(scale_hi/scale_lo). An exponent ≈1 means the
candidate-generation plan grows with ROWS, not PAIRS — the property that
separates "works on 5k docs" from "works at the 10^12-row tier".

Corpus construction (pure column math, fully deterministic): replica r of
the base corpus prefixes every word with ``r{r}`` and offsets doc_id by
r·10^7. Word-prefixing rewrites every shingle/char-gram, so replicas share
NO shingles, minhash bands, or winnowing fingerprints with each other —
each replica reproduces the base corpus's duplicate structure exactly, and
total near-dup pairs grow linearly with scale. (Naive replication would
make every copy a near-dup of its original: output pairs — and any
correct algorithm's cost — would then grow quadratically by construction,
measuring the CORPUS, not the engine.)

The n-gram Jaccard op buckets by (source, replica): the realistic regime
where natural bucket COUNT grows with data while bucket SIZE stays
bounded (per-domain/per-day buckets). Its documented failure mode —
bucket size growing WITH data — is guarded by bucket_cap and routed to
minhash (see dedup.ngram_jaccard_pairs docstring).

Usage: python tools/dataprep_scale_bench.py [--scales 1,4,16] [--iters 2]
Writes /tmp/dataprep_scale.json and prints a markdown table for BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import time

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from vector_spark.session import get_spark
from vector_spark.dataprep import dedup

SF_DIR = "/root/testdata/sf0.1"
WORK = "/tmp/dataprep_scale"


def build_corpus(spark, scale: int) -> str:
    """Materialize the scale× corpus to parquet (scan cost stays real and
    the replication math stays out of the timed region)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(scale).withColumnRenamed("id", "__r")
    out = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__r") * 10_000_000).alias("doc_id"),
            F.when(F.col("__r") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("r"), F.col("__r").cast("string"), F.lit("$1")),
                )
            )
            .alias("text"),
            "lang",
            F.concat_ws("/", F.col("source"), F.col("__r").cast("string")).alias(
                "bucket"
            ),
            "source",
        )
    )
    path = f"{WORK}/docs_x{scale}"
    out.repartition(max(8, scale * 2)).write.mode("overwrite").parquet(path)
    return path


def ops(df: DataFrame) -> dict:
    from vector_spark.dataprep import report
    from vector_spark.dataprep.dedup import minhash_index, normalize
    from vector_spark.dataprep.mixing import leakage_safe_split
    from vector_spark.dataprep.text import chunk_text
    from vector_spark.dataprep.urls import canonical_url

    # incremental-family inputs: even doc_ids are the persisted store,
    # odd doc_ids the arriving batch — both sides scale with the corpus.
    # Store artifacts (fingerprints, LSH index) are materialized OUTSIDE
    # the timed region: the incremental contract is that the index
    # already exists when a batch arrives.
    store = df.filter(F.col("doc_id") % 2 == 0)
    new = df.filter(F.col("doc_id") % 2 == 1)
    store_fps = store.select(
        F.md5(normalize(F.col("text"))).alias("fp")
    ).localCheckpoint()
    store_idx = minhash_index(store).localCheckpoint()
    # leakage-safe split input: the near-dup pair list, which grows
    # linearly with the corpus (replicas share no shingles). Pairs are
    # materialized lazily on first use and cached — the warmup iteration
    # absorbs the minhash cost, so the timed region is component
    # labeling + label join + hash projection, not pair generation.
    _pairs_cache: dict = {}

    def _pairs() -> DataFrame:
        if "p" not in _pairs_cache:
            _pairs_cache["p"] = dedup.minhash_near_dups(df).localCheckpoint()
        return _pairs_cache["p"]
    # canonical-URL-keyed snapshot diff: two crawl snapshots of the same
    # pages whose URL SPELLINGS differ per crawl (default port, tracking
    # param, trailing slash) — the diff is keyed on canonical_url, so
    # added/removed/changed is computed per PAGE, not per spelling.
    old_snap = df.filter(F.col("doc_id") % 4 != 3).select(
        canonical_url(
            F.concat(
                F.lit("HTTPS://Crawl.Example.COM:443/d/"),
                F.col("doc_id").cast("string"),
                F.lit("/?utm_source=crawl&id="),
                F.col("doc_id").cast("string"),
            )
        ).alias("curl"),
        "text",
    )
    new_snap = df.filter(F.col("doc_id") % 4 != 1).select(
        canonical_url(
            F.concat(
                F.lit("https://crawl.example.com/d/"),
                F.col("doc_id").cast("string"),
                F.lit("?id="),
                F.col("doc_id").cast("string"),
            )
        ).alias("curl"),
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return {
        "exact_dedup": lambda: dedup.exact_dedup(df).count(),
        "minhash_near_dups": lambda: dedup.minhash_near_dups(df).count(),
        "winnow_near_dups": lambda: dedup.winnow_near_dups(df).count(),
        "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(
            df, bucket_col="bucket"
        ).count(),
        "bloom_incremental_dedup": lambda: dedup.bloom_incremental_dedup(
            new, store_fps
        )[0].count(),
        "incremental_minhash_dedup": (
            lambda: dedup.incremental_minhash_dedup(new, store_idx)[
                "matches"
            ].count()
        ),
        "chunk_text": lambda: chunk_text(df).count(),
        "winnow_containment": lambda: dedup.winnow_containment(df).count(),
        "leakage_safe_split": lambda: leakage_safe_split(
            df, _pairs()
        ).count(),
        "snapshot_diff_canonical": lambda: report.snapshot_diff(
            old_snap, new_snap, id_col="curl"
        ).count(),
    }


TOKEN_BASE_N = 10_000


def build_token_corpus(spark, scale: int) -> str:
    """Scale× BASELINE token corpus: replica r offsets every token id by
    r·60000 (and prefixes doc_id), so replicas share NO token n-grams —
    each replica reproduces the base generator's near-dup structure
    exactly and total pairs grow linearly with scale (same reasoning as
    the word-prefix trick for text)."""
    from vector_spark import tables

    base = tables.sequences(spark, TOKEN_BASE_N).select("doc_id", "tokens")
    reps = spark.range(scale).withColumnRenamed("id", "__r")
    out = base.crossJoin(reps).select(
        F.concat(
            F.lit("r"), F.col("__r").cast("string"), F.lit("~"), "doc_id"
        ).alias("doc_id"),
        F.transform(
            "tokens", lambda t: (t + F.col("__r") * 60000).cast("int")
        ).alias("tokens"),
    )
    path = f"{WORK}/seq_x{scale}"
    out.repartition(max(8, scale * 2)).write.mode("overwrite").parquet(path)
    return path


def token_ops(df: DataFrame) -> dict:
    from vector_spark.dataprep.contamination import fuzzy_decontaminate

    # fixed-size benchmark dim (replica 0, 1-in-50 of the base docs):
    # the corpus side scales, the benchmark doesn't — the production
    # decontamination regime
    bench = df.filter(
        F.col("doc_id").startswith("r0~")
        & (F.abs(F.hash("doc_id")) % 50 == 0)
    ).localCheckpoint()
    return {
        "token_minhash_near_dups": lambda: dedup.token_minhash_near_dups(
            df, n=8, threshold=0.7
        ).count(),
        "fuzzy_decontaminate": lambda: fuzzy_decontaminate(
            df, bench
        ).count(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--ops", default="", help="comma list; empty = all")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    only = {o for o in args.ops.split(",") if o}

    spark = get_spark("dataprep_scale", shuffle_partitions=32)
    results: dict[str, dict[int, dict]] = {}
    for scale in scales:
        for builder, opfamily in (
            (build_corpus, ops),
            (build_token_corpus, token_ops),
        ):
            path = builder(spark, scale)
            df = spark.read.parquet(path)
            n = df.count()
            family = opfamily(df)
            if only:
                family = {k: v for k, v in family.items() if k in only}
            _run_family(results, family, scale, n, args.iters)

    _report(results, scales)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


def _run_family(results, family, scale, n, iters) -> None:
    for name, fn in family.items():
        best, rows = math.inf, 0
        for _ in range(iters + 1):  # +1 warmup, then min of iters
            t0 = time.monotonic()
            rows = fn()
            dt = time.monotonic() - t0
            best = min(best, dt) if _ else best  # iter 0 = warmup
        results.setdefault(name, {})[scale] = {
            "wall_s": round(best, 3),
            "rows_out": rows,
            "docs_in": n,
        }
        print(f"x{scale:<3} {name:<20} {best:7.2f}s  out={rows}", flush=True)


def _report(results, scales) -> None:
    lo, mid, hi = scales[0], scales[-2], scales[-1]
    table = [
        "| op | " + " | ".join(f"{s}× wall (s)" for s in scales)
        + f" | pairs {lo}×→{hi}× | tail exponent ({mid}×→{hi}×) |",
        "|---|" + "---|" * (len(scales) + 2),
    ]
    for name, by_scale in results.items():
        # tail exponent (two largest scales): the small-scale points are
        # fixed-overhead-dominated (task scheduling ≫ compute at 5k docs)
        t_mid, t_hi = by_scale[mid]["wall_s"], by_scale[hi]["wall_s"]
        exp = math.log(t_hi / t_mid) / math.log(hi / mid)
        cells = " | ".join(f"{by_scale[s]['wall_s']}" for s in scales)
        table.append(
            f"| {name} | {cells} | {by_scale[lo]['rows_out']}→"
            f"{by_scale[hi]['rows_out']} | **{exp:.2f}** |"
        )
        results[name]["exponent"] = round(exp, 3)

    md = "\n".join(table)
    print(md)
    with open("/tmp/dataprep_scale.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
