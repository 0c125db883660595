"""aggregate — tumbling-window metric aggregation by series key.

Parity: reference src/transforms/aggregate.rs:108-356 — key = MetricSeries
(name + namespace + tags), flush every ``interval_ms`` (default 10 s); modes
(aggregate.rs:45-73): ``auto`` (sum incremental / last absolute), ``sum``,
``latest``, ``count``, ``diff`` (vs previous flush, :250-262), ``max``,
``min``, ``mean``, ``stdev`` (:264-316).

The reference flushes on a wall-clock tokio interval; the batch engine
windows on a DATA timestamp (event-time superset, SURVEY.md §2.8): per-sink
aggregate COUNTS are the correctness contract.

Scale: groupBy (window, series) — partial aggregation map-side, one shuffle,
streaming-friendly (same expression works under readStream + watermark).
``diff`` adds a narrow window pass per series over the already-aggregated
(small) frame — not over raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MODES = "auto sum latest count diff max min mean stdev".split()


def _mode_agg(mode: str, value: Column, order: Column) -> Column:
    if mode in ("sum", "diff"):
        return F.sum(value)
    if mode == "latest":
        return F.max_by(value, order)
    if mode == "count":
        return F.count(value)
    if mode == "max":
        return F.max(value)
    if mode == "min":
        return F.min(value)
    if mode == "mean":
        return F.avg(value)
    if mode == "stdev":
        return F.stddev_pop(value)
    raise ValueError(f"unknown aggregate mode {mode!r}")


def aggregate_metrics(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "event_ts",
    interval_secs: int = 10,
    mode: str = "sum",
    kind_col: str | None = None,
    out_col: str = "agg_value",
) -> DataFrame:
    """Tumbling-window aggregate: one row per (window_start, *series_cols).

    Output: series cols + ``window_start:timestamp`` + ``out_col``.
    ``auto`` mode needs ``kind_col`` ('incremental'|'absolute').
    ``diff`` emits the delta vs the previous window of the same series
    (first window diffs against 0, matching the reference's initial flush).
    """
    if mode not in MODES:
        raise ValueError(f"unknown aggregate mode {mode!r}")
    win = F.window(F.col(ts_col), f"{interval_secs} seconds")
    # full-precision event time: unix_timestamp() truncates to seconds,
    # which turns sub-second orderings into scan-order-dependent ties
    order = F.col(ts_col)
    value = F.col(value_col)

    if mode == "auto":
        # sum incremental counters, last absolute gauges (aggregate.rs:152-168)
        if kind_col is None:
            raise ValueError("auto mode requires kind_col")
        inc = F.sum(F.when(F.col(kind_col) == "incremental", value))
        absolute = F.max_by(
            F.when(F.col(kind_col) == "absolute", value), order
        )
        agg = F.coalesce(inc, absolute)
    else:
        agg = _mode_agg(mode, value, order)

    out = (
        df.groupBy(win.alias("__w"), *series_cols)
        .agg(agg.alias(out_col))
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w")
    )
    if mode == "diff":
        w = Window.partitionBy(*series_cols).orderBy("window_start")
        out = out.withColumn(
            out_col, F.col(out_col) - F.lag(out_col, 1, 0.0).over(w)
        )
    return out
