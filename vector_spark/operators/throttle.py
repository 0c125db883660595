"""throttle — rate-limit events per key per time window; excess dropped.

Parity: reference src/transforms/throttle.rs (GCRA token bucket via the
``governor`` crate: ``threshold`` events per ``window_secs`` per ``key_field``
bucket; ``exclude`` bypass, throttle.rs:45-67,119-127).

Batch analog (SURVEY.md §2.1): the first ``threshold`` events per
(key, tumbling window) are kept —
``row_number() over (partition by key, window(ts, w) order by ts) <= t``.
Streaming parity lives in vector_spark.streaming (applyInPandasWithState).

Scale: one shuffle on (key, window). Hot keys are bounded: each (key,window)
partition holds at most the events of one window — AQE skew-split handles a
pathological single-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.conditions import ConditionLike, to_column


def throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key_field: str | None = None,
    ts_col: str = "event_ts",
    exclude: ConditionLike | None = None,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Keep the first ``threshold`` events per key per ``window_secs`` bucket.

    ``tie_breakers``: extra deterministic ordering columns after ``ts_col``
    (recommended — makes "first" reproducible when timestamps collide).

    Scale note: with ``key_field=None`` the window is GLOBAL (all rows of a
    time bucket through one partition) — correct, but only for small/
    pre-filtered streams; always key at the 10^12 tier (SCALING.md).
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / window_secs).cast("long")
    keys = [F.col(key_field)] if key_field else [F.lit(1)]
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = (
        Window.partitionBy(*keys, bucket.alias("__w"))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if exclude is not None:
        # Excluded events bypass the limiter ENTIRELY (reference
        # throttle.rs:52-57: an exclude match never reaches
        # limiter.check_key) — they must not consume threshold slots, so
        # rank only the non-excluded rows with a conditional running count.
        excl = to_column(exclude, df)
        quota_used = F.sum(F.when(excl, F.lit(0)).otherwise(F.lit(1))).over(w)
        keep = excl | (quota_used <= threshold)
    else:
        keep = F.count(F.lit(1)).over(w) <= threshold
    return df.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")
