"""Span → trace assembly: roll the span stream up to one row per trace.

Parity note: the reference carries TraceEvents as opaque log-shaped
events (lib/vector-core/src/event/trace.rs — a thin LogEvent wrapper)
and ships them to trace sinks unaggregated; the trace-level rollup every
APM backend performs on arrival (duration, span count, error count, root
identification) is the natural next operator on a distributed engine,
and the one a 100 TB span table needs BEFORE a human queries it.

Scale shape: ONE map-side-combined groupBy(trace_id) over the span
stream — span rows cross the wire once as partial aggregates; no
self-join, no window over the raw stream. Root selection is min_by over
the rootless-parent spans inside the same aggregate. Status-code
convention: OTLP ``STATUS_CODE_ERROR = 2``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_CODE_ERROR = 2


def trace_assembly(
    df: DataFrame,
    trace_col: str = "trace_id",
    parent_col: str = "parent_span_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    name_col: str = "name",
    service_col: str | None = None,
    status_col: str = "status_code",
) -> DataFrame:
    """One row per trace: span count, wall span (first start → last
    end) in microseconds, error-span count, the ROOT span's name (the
    earliest span with no parent — absent/empty parent id both count as
    rootless), and the number of distinct services touched when
    ``service_col`` is given.

    Returns (trace_id, n_spans, n_errors, trace_start, trace_end,
    duration_us, root_name[, n_services])."""
    root = F.col(parent_col).isNull() | (F.col(parent_col) == "")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(
            (F.col(status_col) == STATUS_CODE_ERROR).cast("int")
        ).cast("long").alias("n_errors"),
        F.min(start_col).alias("trace_start"),
        F.max(end_col).alias("trace_end"),
        F.min_by(
            F.col(name_col), F.when(root, F.col(start_col))
        ).alias("root_name"),
    ]
    if service_col:
        aggs.append(
            F.count_distinct(F.col(service_col)).cast("long").alias(
                "n_services"
            )
        )
    out = df.groupBy(F.col(trace_col).alias("trace_id")).agg(*aggs)
    return out.withColumn(
        "duration_us",
        (
            F.unix_micros(F.col("trace_end"))
            - F.unix_micros(F.col("trace_start"))
        ).cast("long"),
    )
