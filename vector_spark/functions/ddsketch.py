"""AgentDDSketch — Datadog Agent's DDSketch variant as column math.

Parity: reference ``lib/vector-core/src/metrics/ddsketch.rs`` (Vector's
distribution representation; the datadog_metrics sink ships it in the
SketchPayload and native_json serializes it as ``{"sketch":
{"AgentDDSketch": {bins: {k, n}, count, min, max, sum, avg}}}``).

Mapping math (Config::new, :80-146): the Agent default is
``eps = 1/128`` doubled to ``γ = 1 + 2ε = 1.015625``; a value maps to bin
key ``round_half_even(ln(v) / ln(γ)) + bias`` clamped to ``[1, 32767]``,
mirrored for negatives, with key 0 for ``|v| < norm_min`` where
``bias = 1 − ⌊ln(min_value)/ln(γ)⌋`` (min_value ``1e-9``) and
``norm_min = γ^(1−bias)``. Bin counts are u16 — wider counts split into
repeated bins of the same key (Bin::increment, MAX_BIN_WIDTH 65535).

Spark-first shape: the key is pure column math (``F.bround`` IS
round-half-even), so sketching a corpus is one map-side-combined
``groupBy(key).count()`` per group — the shuffle carries (group, key,
count) rows, never samples; the per-group bin arrays assemble with
``sort_array + collect_list`` over the ALREADY-aggregated key dim
(bounded by the ~2^15 key space, not the corpus). Relative-error
guarantee: any value reconstructs from its bin within γ-relative error
(two-sided 2ε ≈ 1.56%).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1.0 / 128.0
GAMMA = 1.0 + 2.0 * EPS
GAMMA_LN = math.log1p(2.0 * EPS)
MIN_VALUE = 1.0e-9
NORM_BIAS = -int(math.floor(math.log(MIN_VALUE) / GAMMA_LN)) + 1
NORM_MIN = GAMMA ** (1 - NORM_BIAS)
MAX_KEY = 32767
MAX_BIN_WIDTH = 65535


def ddsketch_key(v: Column) -> Column:
    """Config::key as a column expression (i16 semantics)."""
    mag = F.abs(v)
    pos_key = F.least(
        F.greatest(
            (F.bround(F.log(mag) / GAMMA_LN) + NORM_BIAS).cast("int"),
            F.lit(1),
        ),
        F.lit(MAX_KEY),
    )
    signed = F.when(v < 0, -pos_key).otherwise(pos_key)
    return F.when(mag < NORM_MIN, F.lit(0)).otherwise(signed).cast("int")


def bin_lower_bound(k: int) -> float:
    """Config::bin_lower_bound for a single key (test/quantile helper)."""
    if k < 0:
        return -bin_lower_bound(-k)
    if k in (0, 1):
        return 0.0
    if k == MAX_KEY:
        return float("inf")
    return GAMMA ** (k - NORM_BIAS)


def quantile_from_bins(ks: list[int], ns: list[int], q: float) -> float:
    """Rank-walk quantile over (k, n) bins (test helper, mirrors the
    reference's bin walk with lower-bound reconstruction)."""
    total = sum(ns)
    if total == 0:
        return float("nan")
    rank = q * (total - 1)
    seen = 0
    for k, n in sorted(zip(ks, ns)):
        seen += n
        if seen > rank:
            return bin_lower_bound(k)
    return bin_lower_bound(ks[-1])


def ddsketch_agg(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Aggregate values into one AgentDDSketch row per group.

    Output: group cols + ``ks array<int>, ns array<int>`` (parallel,
    sorted by key, u16-chunked), ``count, min, max, sum, avg``.
    """
    keyed = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("_v"),
        ddsketch_key(F.col(value_col).cast("double")).alias("_k"),
    )
    per_key = keyed.groupBy(*group_cols, "_k").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_v").alias("_vmin"), F.max("_v").alias("_vmax"),
        F.sum("_v").alias("_vsum"),
    )
    # u16 chunking: a key with n > 65535 repeats with MAX_BIN_WIDTH bins.
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.floor((F.col("_n") - 1) / MAX_BIN_WIDTH).cast("int"),
        ),
        lambda i: F.struct(
            F.col("_k").alias("k"),
            F.least(
                F.col("_n") - i * MAX_BIN_WIDTH, F.lit(MAX_BIN_WIDTH)
            ).cast("int").alias("n"),
        ),
    )
    chunked = per_key.select(
        *group_cols, "_vmin", "_vmax", "_vsum", "_n",
        chunks.alias("_chunks"),
    )
    bins = F.array_sort(F.flatten(F.collect_list("_chunks")))
    return chunked.groupBy(*group_cols).agg(
        F.transform(bins, lambda b: b["k"]).alias("ks"),
        F.transform(bins, lambda b: b["n"]).alias("ns"),
        F.sum("_n").alias("count"),
        F.min("_vmin").alias("min"), F.max("_vmax").alias("max"),
        F.sum("_vsum").alias("sum"),
    ).withColumn("avg", F.col("sum") / F.col("count"))
