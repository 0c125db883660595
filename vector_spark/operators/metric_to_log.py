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
