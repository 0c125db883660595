"""metric_to_log — serialize metric rows to structured log events.

Parity: reference src/transforms/metric_to_log.rs:30-48,255-300 — the metric
becomes a JSON-ish tree; the ``host`` tag is lifted to the log schema's host
key. Columnar form: pack the metric columns into a struct / JSON string
column; pure projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metric_to_log(
    df: DataFrame,
    metric_cols: list[str] | None = None,
    host_tag: str | None = None,
    json_col: str = "message",
) -> DataFrame:
    """Pack metric columns into a JSON ``message`` column (+ lifted host)."""
    cols = metric_cols or df.columns
    out = df.withColumn(json_col, F.to_json(F.struct(*[F.col(c) for c in cols])))
    if host_tag and host_tag in df.columns:
        out = out.withColumn("host", F.col(host_tag))
    return out


def log_to_metric_all(
    df: DataFrame,
    json_col: str = "message",
    schema: str | None = None,
) -> DataFrame:
    """``all_metrics=true`` mode of log_to_metric (reference
    log_to_metric.rs:46-76, ``to_metrics`` :731): interpret the whole
    event as a serialized metric — the exact inverse of
    :func:`metric_to_log`. ``schema`` is the metric frame DDL; defaults to
    the normalized layout ``log_to_metric`` emits. Rows that do not parse
    as a metric (no ``name``) are dropped, matching the reference's
    per-event conversion failure."""
    schema = schema or (
        "name string, namespace string, metric_type string, kind string, "
        "event_ts timestamp, value double"
    )
    parsed = df.withColumn("__m", F.from_json(F.col(json_col), schema))
    return (
        parsed.filter(F.col("__m.name").isNotNull())
        .select(F.col("__m.*"))
    )
