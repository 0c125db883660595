"""datadog_metrics sink encoder — series v1 JSON payloads.

Parity: reference ``src/sinks/datadog/metrics/encoder.rs`` +
``src/common/datadog.rs:35-60`` (DatadogSeriesMetric serde order
``metric, type, interval, points, tags, host?, source_type_name?,
device?, metadata?`` — interval and tags serialize ``null``/value
always, the rest skip when absent):

* kind mapping (encoder.rs generate_series_metrics): incremental counter
  WITH interval → type ``rate`` with value ÷ interval-seconds; counter
  without interval → ``count``; gauge → ``gauge``; set → ``gauge`` with
  the cardinality as the value;
* ``interval`` is interval_ms / 1000 (integer division);
* points are ``[[epoch-seconds, value]]``;
* tags render as the SORTED ``"k:v"`` list (encode_tags) AFTER the
  ``host`` / ``source_type_name`` / ``device`` keys are pulled out into
  their own fields — host is always emitted (empty string when the tag
  is absent, the reference's ``unwrap_or_default``);
* metric name namespaces as ``namespace.name``;
* the body is ``{"series":[...]}`` (SERIES_PAYLOAD_HEADER).

Pure JVM column math; values render via the ryu-form json_f64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.native_json import _json_str, json_f64

_SPECIAL = ("host", "source_type_name", "device")


def namespaced_name(name: Column, namespace: Column | None) -> Column:
    if namespace is None:
        return name
    return F.when(
        namespace.isNotNull() & (namespace != ""),
        F.concat(namespace, F.lit("."), name),
    ).otherwise(name)


def encode_tags(tags: Column) -> Column:
    """map → sorted '"k:v"' JSON array string (special keys removed)."""
    cleaned = F.map_filter(tags, lambda k, v: ~k.isin(*_SPECIAL))
    pairs = F.array_sort(F.transform(
        F.map_entries(cleaned),
        lambda e: F.concat(e["key"], F.lit(":"), e["value"]),
    ))
    return F.to_json(pairs)


def encode_datadog_series(
    name: Column,
    kind: Column,
    metric_type: Column,
    value: Column,
    ts: Column,
    tags: Column,
    namespace: Column | None = None,
    interval_ms: Column | None = None,
    set_cardinality: Column | None = None,
) -> Column:
    """One DatadogSeriesMetric object (see module doc). Returns NULL for
    metric types the series payload cannot carry."""
    iv_s = (
        (interval_ms.cast("long") / 1000).cast("long")
        if interval_ms is not None else F.lit(None).cast("long")
    )
    is_rate = (metric_type == "counter") & (kind == "incremental") \
        & iv_s.isNotNull()
    is_count = (metric_type == "counter") & ~is_rate
    is_gauge = metric_type == "gauge"
    is_set = metric_type == "set"

    dd_type = (
        F.when(is_rate, F.lit("rate"))
        .when(is_count, F.lit("count"))
        .when(is_gauge | is_set, F.lit("gauge"))
    )
    point_val = (
        F.when(is_rate, value / iv_s.cast("double"))
        .when(
            is_set,
            (set_cardinality if set_cardinality is not None
             else F.lit(None)).cast("double"),
        )
        .otherwise(value)
    )
    iv_out = F.when(is_rate, iv_s.cast("string")).otherwise(F.lit("null"))
    ts_s = F.unix_seconds(ts)

    host = F.coalesce(tags["host"], F.lit(""))
    stn, device = tags["source_type_name"], tags["device"]

    obj = F.concat(
        F.lit('{"metric":'), _json_str(namespaced_name(name, namespace)),
        F.lit(',"type":'), _json_str(dd_type),
        F.lit(',"interval":'), iv_out,
        F.lit(',"points":[['), ts_s.cast("string"), F.lit(","),
        json_f64(point_val), F.lit("]]"),
        F.lit(',"tags":'), encode_tags(tags),
        F.lit(',"host":'), _json_str(host),
        F.when(stn.isNotNull(),
               F.concat(F.lit(',"source_type_name":'), _json_str(stn)))
        .otherwise(F.lit("")),
        F.when(device.isNotNull(),
               F.concat(F.lit(',"device":'), _json_str(device)))
        .otherwise(F.lit("")),
        F.lit("}"),
    )
    return F.when(dd_type.isNotNull(), obj)


def series_body(objs: Column) -> Column:
    """Collected series objects → ``{"series":[...]}``."""
    return F.concat(
        F.lit('{"series":['), F.array_join(objs, ","), F.lit("]}")
    )
