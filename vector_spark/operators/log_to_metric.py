"""log_to_metric / metric_to_log — log↔metric projection.

Parity: reference src/transforms/log_to_metric.rs — per MetricConfig take a
field's value and emit ``counter`` (by 1 or by value, :80-90,162-168),
``gauge``, ``set``, ``histogram``, ``summary`` metric events; name/namespace/
tags are templates over event fields (:126-132).

In the columnar engine a "metric event" is a row of a normalized metric
frame: ``(name, namespace, tags..., kind, ts, value)``. The emit step is a
pure projection (Function flavor — narrow, no shuffle); the downstream
``aggregate`` operator materializes counter sums / set cardinalities /
histogram sketches, matching the reference's split of responsibilities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METRIC_TYPES = "counter gauge set histogram summary".split()


def log_to_metric(
    df: DataFrame,
    metric_type: str,
    name: str,
    field: str | None = None,
    increment_by_value: bool = False,
    namespace: str = "",
    tag_cols: list[str] | None = None,
    ts_col: str = "event_ts",
) -> DataFrame:
    """Project log rows to normalized metric rows.

    counter: value = field value if ``increment_by_value`` else 1.0
    gauge/histogram/summary: value = field value (row dropped if null,
    matching reference parse-failure behavior :162-190)
    set: value carried as string in ``set_value`` (cardinality computed by
    the aggregate stage via approx_count_distinct / collect_set).
    """
    if metric_type not in METRIC_TYPES:
        raise ValueError(f"unknown metric type {metric_type!r}")
    tags = [F.col(c).cast("string").alias(c) for c in (tag_cols or [])]
    base = [
        F.lit(name).alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit(metric_type).alias("metric_type"),
        F.lit("incremental" if metric_type in ("counter", "histogram", "summary") else "absolute").alias("kind"),
        F.col(ts_col).alias("event_ts"),
        *tags,
    ]
    if metric_type == "set":
        if field is None:
            raise ValueError("set metric requires field")
        return df.select(*base, F.col(field).cast("string").alias("set_value"))
    if metric_type == "counter" and not increment_by_value:
        value: Column = F.lit(1.0)
        out = df.select(*base, value.alias("value"))
    else:
        if field is None:
            raise ValueError(f"{metric_type} metric requires field")
        out = df.select(*base, F.col(field).cast("double").alias("value"))
        out = out.filter(F.col("value").isNotNull())
    return out
