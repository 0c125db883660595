"""Heavy hitters (top talkers) over a high-cardinality key.

The reference surfaces per-tag explosion control (`tag_cardinality_limit`,
reference src/transforms/tag_cardinality_limit/mod.rs) but has no "which
keys dominate the stream" operator; in a log pipeline that question (top
talkers by host/user/token) is asked constantly, and at the 10^12-row
tier the naive answer — groupBy(key).count().orderBy desc — shuffles one
row per DISTINCT key, which is exactly what explodes.

Two scale paths, matching the sketch family already in the repo
(approx_count_distinct / approx_percentile gates):

- :func:`heavy_hitters` — deterministic two-phase: a 1/``sample_mod``
  row sample nominates candidate keys (any key with true share ≥
  ``min_share`` appears in the sample w.h.p.; the nomination threshold
  is relaxed by ``candidate_frac``), then ONE exact pass counts ONLY the
  candidates (broadcast semi-join — the shuffle carries candidate keys,
  a set bounded by ``sample_rows / threshold``, never the full key
  space). Deterministic given the sample column, hence bit-reproducible
  by the DuckDB oracle (gate `seq_heavy_hitters`).
- :func:`cms_sketch` / :func:`cms_estimate` — the mergeable-sketch path
  (Cormode & Muthukrishnan count-min, Spark's built-in
  ``count_min_sketch`` aggregate): fixed ``d×w`` counters per group,
  map-side mergeable, ships to a metrics sink like the HLL/KLL sketches;
  estimates are overestimates within ``eps·N`` at ``confidence``
  (pytest-verified by decoding the sketch JVM-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key_col: str | Column,
    min_share: float,
    sample_col: str,
    sample_mod: int = 20,
    candidate_frac: float = 0.5,
    total: int | None = None,
    out_key: str = "key",
) -> DataFrame:
    """Keys whose share of ``df`` is ≥ ``min_share``, with exact counts.

    ``sample_col`` must be a numeric column with uniformly distributed
    residues INDEPENDENT of the key (a row index or a data-derived hash
    of something other than the key — a stride-planted key correlated
    with the residue would dodge the sample entirely); the
    candidate phase keeps rows where ``sample_col % sample_mod == 0``,
    making the sample deterministic and retry-stable (same posture as
    the data-derived salts in operators/skew.py).

    Returns (key, n_rows, share) sorted by count desc then key.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    base = df.select(key.alias(out_key), F.col(sample_col).alias("__s"))
    n = total if total is not None else base.count()
    min_count = min_share * n

    cand = (
        base.filter(F.col("__s") % sample_mod == 0)
        .groupBy(out_key)
        .agg(F.count(F.lit(1)).alias("__sc"))
        .filter(F.col("__sc") >= candidate_frac * min_count / sample_mod)
        .select(out_key)
    )
    return (
        base.join(F.broadcast(cand), out_key, "left_semi")
        .groupBy(out_key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
        .withColumn("share", F.round(F.col("n_rows") / F.lit(n), 6))
        .orderBy(F.desc("n_rows"), out_key)
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Aggregate ``key_col`` into a count-min sketch (binary column
    ``cms``), optionally per ``group_by`` group. The sketch is a fixed
    ``d = ceil(ln(1/(1-confidence)))`` × ``w = ceil(e/eps)`` counter
    grid — mergeable map-side like any Spark aggregate, so the shuffle
    ships kilobytes per group regardless of key cardinality."""
    agg = F.count_min_sketch(
        F.col(key_col), F.lit(eps), F.lit(confidence), F.lit(seed)
    ).alias("cms")
    return df.groupBy(*(group_by or [])).agg(agg)


def cms_estimate(
    spark: SparkSession, sketch: bytes, items: list[object]
) -> dict[object, int]:
    """Decode a sketch produced by :func:`cms_sketch` and point-query it
    for ``items`` (driver-side — the pattern for a monitoring sink that
    received the sketch bytes). Estimates never undercount; they
    overcount by ≤ eps·N with the sketch's confidence."""
    jvm = spark._jvm
    bb = jvm.java.io.ByteArrayInputStream(bytes(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bb)
    return {it: int(cms.estimateCount(it)) for it in items}
