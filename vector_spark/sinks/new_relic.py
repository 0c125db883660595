"""New Relic sink encoders — Logs API and Metrics API wire bodies.

Parity: reference ``src/sinks/new_relic/model.rs``:

* Logs API (:249-312): body is ``[{"logs":[...]}]`` (LogsApiModel is a
  1-element array of LogDataStore); each LogMessage serializes in struct
  order ``message, timestamp?, attributes`` where ``message`` defaults to
  ``"log from vector"`` when the event has none (:354-360), ``timestamp``
  is epoch-millis when the event timestamp is a real timestamp (:342-352,
  skipped when absent), and ``attributes`` is the remaining event object
  with array-valued fields stripped recursively (:332-340; ObjectMap is a
  BTreeMap ⇒ sorted keys).
* Metrics API (:27-47, :50-140): body is ``[{"metrics":[...]}]``; each
  MetricData serializes ``interval.ms?, name, type, value, timestamp,
  attributes?``. Kind mapping: incremental counter → type ``count`` and
  REQUIRES interval_ms (dropped otherwise, :71-77); absolute counter or
  any gauge → type ``gauge`` with no interval (:78-79); other metric
  values and NaN values drop (:80-90); ``timestamp`` is epoch-millis.

The Events API model (:144-244) is deliberately a composition here: its
JSON-message-merge step is the ``remap``/``parse_json``+``merge`` recipe
followed by ``encode_json`` — there is no separate wire framing to pin.

Attribute objects arrive as ``map<string,string>`` whose VALUES are
pre-encoded JSON values (quote strings with
:func:`vector_spark.functions.native_json._json_str`-style helpers, cast
numbers to string) — that keeps typing exact while letting one column
expression emit the sorted-key object. All pure JVM column math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.native_json import _json_str, json_f64


def json_object(fields: Column) -> Column:
    """map<string,string(pre-encoded JSON value)> → sorted-key object."""
    entries = F.array_sort(F.map_entries(fields))
    return F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(_json_str(e["key"]), F.lit(":"), e["value"]),
            ),
            ",",
        ),
        F.lit("}"),
    )


def encode_new_relic_log(
    message: Column,
    ts_ms: Column | None = None,
    attributes: Column | None = None,
) -> Column:
    """One Logs-API LogMessage object (see module doc for field order)."""
    msg = F.coalesce(message, F.lit("log from vector"))
    out = F.concat(F.lit('{"message":'), _json_str(msg))
    if ts_ms is not None:
        out = F.concat(
            out,
            F.when(
                ts_ms.isNotNull(),
                F.concat(F.lit(',"timestamp":'),
                         ts_ms.cast("long").cast("string")),
            ).otherwise(F.lit("")),
        )
    attrs = (
        json_object(attributes) if attributes is not None else F.lit("{}")
    )
    return F.concat(out, F.lit(',"attributes":'), attrs, F.lit("}"))


def logs_body(objs: Column) -> Column:
    """Aggregate expression: collected LogMessage objects → the POST body
    ``[{"logs":[...]}]``. Pass e.g. ``F.sort_array(F.collect_list(obj))``
    for a deterministic order (the reference preserves arrival order,
    which has no distributed analog)."""
    return F.concat(
        F.lit('[{"logs":['), F.array_join(objs, ","), F.lit("]}]")
    )


def encode_new_relic_metric(
    name: Column,
    kind: Column,
    metric_type: Column,
    value: Column,
    ts_ms: Column,
    interval_ms: Column | None = None,
    attributes: Column | None = None,
) -> Column:
    """One Metrics-API MetricData object, or NULL when the reference
    drops the event (incremental counter without interval; NaN value;
    non-counter/gauge type)."""
    iv = interval_ms if interval_ms is not None else F.lit(None).cast("long")
    is_count = (metric_type == "counter") & (kind == "incremental")
    is_gauge = (metric_type == "gauge") | (
        (metric_type == "counter") & (kind == "absolute")
    )
    nr_type = F.when(is_count, F.lit("count")).when(is_gauge, F.lit("gauge"))
    head = F.when(
        is_count & iv.isNotNull(),
        F.concat(F.lit('{"interval.ms":'), iv.cast("long").cast("string"),
                 F.lit(",")),
    ).when(is_gauge, F.lit("{"))
    body = F.concat(
        head,
        F.lit('"name":'), _json_str(name),
        F.lit(',"type":'), _json_str(nr_type),
        F.lit(',"value":'), json_f64(value),
        F.lit(',"timestamp":'), ts_ms.cast("long").cast("string"),
    )
    if attributes is not None:
        body = F.concat(
            body,
            F.when(
                attributes.isNotNull() & (F.size(attributes) > 0),
                F.concat(F.lit(',"attributes":'), json_object(attributes)),
            ).otherwise(F.lit("")),
        )
    return F.when(~F.isnan(value), F.concat(body, F.lit("}")))


def metrics_body(objs: Column) -> Column:
    """Collected MetricData objects → ``[{"metrics":[...]}]``."""
    return F.concat(
        F.lit('[{"metrics":['), F.array_join(objs, ","), F.lit("]}]")
    )
