"""filter — keep events matching a condition, drop the rest.

Parity: reference src/transforms/filter.rs:86-95 (Function flavor,
``enable_concurrency``). In Spark the predicate is pushed into the scan by
Catalyst when it references only source columns — strictly better than the
reference's post-decode per-event check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vector_spark.conditions import ConditionLike, to_column


def filter_events(df: DataFrame, condition: ConditionLike) -> DataFrame:
    return df.filter(to_column(condition, df))
