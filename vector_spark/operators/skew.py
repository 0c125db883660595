"""Skew handling: salted two-phase aggregation + salted repartition.

The north-rule input is skewed by construction (~45% of rows share
``source='app'``). AQE's skew-join splitting handles joins; for
aggregations/repartitions on the hot key we provide explicit salting
(SURVEY.md §4 — the one scale mechanism Spark doesn't fully automate):

- :func:`salted_agg`: groupBy(key) where one key dominates → phase 1
  groupBy(key, salt) (splits the hot key across ``salt_buckets`` reducers),
  phase 2 groupBy(key) merge. Associative aggs only (sum/count/max/min).
  With partial (map-side) aggregation Spark already compresses per-task
  duplicates, so salting matters when per-key GROUPS (not rows) are few but
  row counts are huge and map-side partials can't compress (e.g. high-
  cardinality secondary grouping or collect-style aggs).
- :func:`salted_repartition`: spreads a hot partition key for writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum": F.sum, "count": F.sum, "max": F.max, "min": F.min}


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets) — derived from a stable
    row attribute when available (monotonically_increasing_id is partition-
    stable, not data-stable; prefer a data column via ``salt_from``)."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % buckets).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_from: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output col → (how, input col)
    with how in sum/count/max/min.

    ``salt_from``: optional deterministic salt expression (e.g.
    ``F.xxhash64('doc_id') % 16``) — reproducible across retries, unlike
    the default monotonic id.
    """
    for how, _ in aggs.values():
        if how not in _MERGEABLE:
            raise ValueError(f"non-mergeable agg {how!r}")
    salt = (
        (salt_from % salt_buckets).cast("int")
        if salt_from is not None
        else (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                (F.count(F.lit(1)) if how == "count" else getattr(F, how)(col)).alias(out)
                for out, (how, col) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGEABLE[how](out).alias(out) for out, (how, _) in aggs.items()]
    )


def salted_repartition(
    df: DataFrame, key: str, buckets: int, partitions: int | None = None
) -> DataFrame:
    """Repartition on (key, salt) so a hot key spreads over ``buckets``
    partitions instead of one (writer-side skew fix)."""
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % buckets).cast("int")
    )
    out = (
        salted.repartition(partitions, key, "__salt")
        if partitions
        else salted.repartition(key, "__salt")
    )
    return out.drop("__salt")
