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

Salts are ALWAYS data-derived (a hash of caller-named columns): a salt from
``monotonically_increasing_id`` would be partition-stable but not
data-stable — a task retry can re-salt rows differently mid-job, which is a
correctness hazard for anything non-associative downstream and makes reruns
non-reproducible. There is deliberately no nondeterministic fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum": F.sum, "count": F.sum, "max": F.max, "min": F.min}


def _resolve_salt(salt_from: Column | str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a column name (hashed) or an
    arbitrary caller expression. Pure function of row DATA → identical on
    retry/re-execution."""
    expr = F.xxhash64(salt_from) if isinstance(salt_from, str) else salt_from
    return F.pmod(expr, F.lit(buckets)).cast("int")


def with_salt(
    df: DataFrame, buckets: int, salt_from: Column | str, col_name: str = "__salt"
) -> DataFrame:
    """Attach a deterministic per-row salt in [0, buckets) derived from
    ``salt_from`` (a data column name to hash, or any deterministic
    expression)."""
    return df.withColumn(col_name, _resolve_salt(salt_from, buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: Column | str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output col → (how, input col)
    with how in sum/count/max/min.

    ``salt_from``: REQUIRED deterministic salt source — a data column name
    (hashed with xxhash64) or an expression (e.g. ``F.xxhash64('doc_id')``).
    Reproducible across task retries, unlike a monotonic-id salt.
    """
    for how, _ in aggs.values():
        if how not in _MERGEABLE:
            raise ValueError(f"non-mergeable agg {how!r}")
    salt = _resolve_salt(salt_from, salt_buckets)
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
    df: DataFrame,
    key: str,
    buckets: int,
    salt_from: Column | str,
    partitions: int | None = None,
) -> DataFrame:
    """Repartition on (key, salt) so a hot key spreads over ``buckets``
    partitions instead of one (writer-side skew fix). ``salt_from``: data
    column name or deterministic expression (see module docstring)."""
    salted = df.withColumn("__salt", _resolve_salt(salt_from, buckets))
    out = (
        salted.repartition(partitions, key, "__salt")
        if partitions
        else salted.repartition(key, "__salt")
    )
    return out.drop("__salt")
