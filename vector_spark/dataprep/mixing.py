"""Deterministic source-mixture sampling for training corpora.

Pretraining datasets are mixed from sources with target weights (e.g.
web 60% / code 20% / books 20%). This operator draws an EXACT quota per
source, deterministically (hash-ranked, so re-execution and retries pick
the same documents — no RNG state).

Scale shape: ranking is a per-source window sort — one shuffle on the
source key, the same exchange a groupBy would pay, and AQE splits skewed
sources. For corpora where even per-source sorting is too hot, the
documented alternative is hash-THRESHOLD sampling (keep rows with
``pmod(hash, M) < rate*M`` — no shuffle, approximate counts); this module
implements the exact-quota path since mixture weights are usually
contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate_quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder apportionment: integer quotas summing to
    ``total``, proportional to ``weights`` (deterministic tie-break by
    source name)."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    s = float(sum(weights.values()))
    if s <= 0:
        raise ValueError("weights must sum to a positive value")
    raw = {k: total * w / s for k, w in weights.items()}
    base = {k: int(v) for k, v in raw.items()}
    short = total - sum(base.values())
    by_rem = sorted(raw, key=lambda k: (-(raw[k] - base[k]), k))
    for k in by_rem[:short]:
        base[k] += 1
    return base


def sample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep a hash-ranked sample of exactly ``quota[source]`` rows per
    source (fewer if the source is smaller than its quota — quotas are not
    redistributed, mirroring how mixture shortfalls are surfaced, not
    hidden). Rank order is ``md5(key)`` — portable across engines, so an
    external SQL engine reproduces the exact same sample."""
    quotas = allocate_quotas(weights, total)
    qmap = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.filter(F.col(source_col).isin(list(quotas)))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= qmap[F.col(source_col)])
        .drop("__rk")
    )
