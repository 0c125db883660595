"""Distributed-trained quality classifier — logistic regression as
DataFrame aggregations, bit-exact reproducible across engines.

The fastText-style "train a tiny classifier to replace the heuristic"
step every production curation pipeline grows (CCNet §4.3, Gopher
Appendix A dataset filtering): here the rule-based ``quality_score``
teacher labels the corpus and a linear model distills it over the
closed-form quality features.

Why this is reproducible when distributed training usually isn't:

- **no libm**: the link is the rational "fast sigmoid"
  ``σ(z) = 0.5 + z / (2·(1+|z|))`` — pure +,·,/,abs on doubles, which
  IEEE-754 fixes bit-for-bit in every engine, unlike ``exp`` whose last
  ulp is libm-specific.
- **order-independent gradients**: each row's per-feature gradient
  contribution is micro-quantized to an int64 (``ROUND(err·x·10⁶)``);
  integer SUM is associative, so any partitioning/engine produces the
  identical gradient vector. The weight update runs on the quantized
  sums with literal arithmetic — weights after T steps are a pure
  function of the corpus.
- **one aggregation per step**: the corpus-scale cost is T map-side-
  combined ``agg`` jobs over a persisted k+1-column feature frame; model
  state (k doubles) lives on the driver like any enrichment dim.

The DuckDB oracle replays the ENTIRE training loop (unrolled CTE stages
— see oracles.quality_classifier_sql) and must land on the same
micro-quantized weights and the same predictions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataprep import text as tx

FEATURE_NAMES = ("bias", "uniq_ratio", "punct_ratio", "digit_ratio",
                 "stop_ratio_en")


def fast_sigmoid(z: Column) -> Column:
    """Rational sigmoid: 0.5 + z/(2(1+|z|)) — same shape as the logistic
    link, zero libm."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def feature_frame(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, x_0..x_k-1, y): closed-form quality features (each already
    ROUND(...,4)-pinned in quality_features) + the teacher label."""
    q = tx.quality_features(F.col(text_col))
    cols = {
        "bias": F.lit(1.0),
        "uniq_ratio": q["uniq_ratio"],
        "punct_ratio": q["punct_ratio"],
        "digit_ratio": q["digit_ratio"],
        "stop_ratio_en": q["stop_ratio_en"],
    }
    y = F.when(
        tx.quality_score(F.col(text_col)) >= 0.5, F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        *[cols[n].alias(f"x_{i}") for i, n in enumerate(FEATURE_NAMES)],
        y.alias("y"),
    )


def _z(w: list[float], k: int) -> Column:
    z = F.lit(float(w[0])) * F.col("x_0")
    for j in range(1, k):
        z = z + F.lit(float(w[j])) * F.col(f"x_{j}")
    return z


def train(
    feats: DataFrame,
    lr: float = 0.5,
    iters: int = 5,
    scale: int = 10**6,
) -> tuple[list[float], int]:
    """T gradient steps over a (x_0..x_k-1, y) frame → (weights, n).

    Persist ``feats`` before calling — every step re-aggregates it."""
    k = len(FEATURE_NAMES)
    n = feats.count()
    w = [0.0] * k
    for _ in range(iters):
        s = F.round(fast_sigmoid(_z(w, k)), 6)
        err = s - F.col("y")
        sums = feats.agg(
            *[
                F.sum(
                    F.round(err * F.col(f"x_{j}") * scale, 0).cast("long")
                ).alias(f"g_{j}")
                for j in range(k)
            ]
        ).collect()[0]
        w = [
            w[j] - lr * (sums[f"g_{j}"] / (n * scale))
            for j in range(k)
        ]
    return w, n


def predictions(feats: DataFrame, w: list[float]) -> DataFrame:
    """(id, score, label) with score = rounded fast-sigmoid margin."""
    s = F.round(fast_sigmoid(_z(w, len(FEATURE_NAMES))), 6)
    return feats.select(
        *[c for c in ("doc_id",) if c in feats.columns],
        s.alias("score"),
        (s >= 0.5).cast("int").alias("label"),
        F.col("y").cast("int").alias("teacher"),
    )
