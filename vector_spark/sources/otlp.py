"""OpenTelemetry (OTLP/JSON) logs source decode.

Parity: reference ``src/sources/opentelemetry`` +
``lib/opentelemetry-proto/src/convert.rs`` (ResourceLogs::into_event_iter
and ResourceLog::into_event, convert.rs:41-57,201-365):

- an ``ExportLogsServiceRequest`` fans out to one event per
  ``resourceLogs[] × scopeLogs[] × logRecords[]`` (convert.rs:42-56) —
  here three JVM-side ``explode`` Generates, no Python;
- legacy-namespace field mapping (convert.rs:211-217,221-283):
  ``message`` ← body, ``resource`` ← resource.attributes (kv-list →
  object, convert.rs:108-120), ``attributes`` ← logRecord.attributes,
  ``scope.name/version`` ← instrumentation scope,
  ``trace_id``/``span_id`` hex (convert.rs:124-129; OTLP/JSON already
  carries them hex-encoded), ``severity_text`` / ``severity_number``
  (0 = Unspecified means absent, convert.rs:311), ``flags`` (>0 only,
  convert.rs:320), ``dropped_attributes_count``;
- timestamps (convert.rs:338-365): ``observed_timestamp`` =
  observedTimeUnixNano when >0 else "now" (our distributed analog: a
  caller-supplied deterministic default — wall-clock would break
  replayability); ``timestamp`` = timeUnixNano when >0 else
  observed_timestamp.

AnyValue (convert.rs:77-95): OTLP/JSON encodes each attribute value as a
one-key object ``{"stringValue":…}`` / ``intValue`` / ``doubleValue`` /
``boolValue``; we canonicalize to the string form of the scalar, which
is what a map<string,string> event field can carry engine-portably
(arrayValue/kvlistValue nesting is scoped out — the reference flattens
them into Value trees; a typed Spark column cannot hold a heterogeneous
tree, and log-pipeline attributes are overwhelmingly scalar).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# protobuf JSON mapping: camelCase field names; 64-bit ints are JSON
# strings (timeUnixNano) — parsed as string then cast.
_ANY_VALUE = T.StructType(
    [
        T.StructField("stringValue", T.StringType()),
        T.StructField("intValue", T.StringType()),
        T.StructField("doubleValue", T.DoubleType()),
        T.StructField("boolValue", T.BooleanType()),
    ]
)

_KV_LIST = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", _ANY_VALUE),
        ]
    )
)

_LOG_RECORD = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("observedTimeUnixNano", T.StringType()),
        T.StructField("severityNumber", T.IntegerType()),
        T.StructField("severityText", T.StringType()),
        T.StructField("body", _ANY_VALUE),
        T.StructField("attributes", _KV_LIST),
        T.StructField("droppedAttributesCount", T.IntegerType()),
        T.StructField("flags", T.IntegerType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
    ]
)

OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", _KV_LIST)]
                            ),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "name", T.StringType()
                                                    ),
                                                    T.StructField(
                                                        "version",
                                                        T.StringType(),
                                                    ),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "logRecords",
                                            T.ArrayType(_LOG_RECORD),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _any_value_str(v: Column) -> Column:
    """AnyValue → canonical string (convert.rs:77-95 scalar arms).

    Booleans render lowercase true/false; doubles keep Spark's
    shortest-round-trip cast (matches DuckDB's VARCHAR cast for the
    integral-valued doubles used in tests).
    """
    return F.coalesce(
        v["stringValue"],
        v["intValue"],
        F.when(
            v["doubleValue"].isNotNull(),
            F.when(
                v["doubleValue"] == v["doubleValue"].cast("long").cast("double"),
                v["doubleValue"].cast("long").cast("string"),
            ).otherwise(v["doubleValue"].cast("string")),
        ),
        F.when(v["boolValue"].isNotNull(), v["boolValue"].cast("string")),
    )


def _kv_to_map(kvs: Column) -> Column:
    """kv-list → map<string,string> (kv_list_into_value, convert.rs:108-120;
    entries whose value is absent are dropped, matching the filter_map)."""
    pairs = F.filter(
        F.transform(
            kvs,
            lambda kv: F.struct(
                kv["key"].alias("key"),
                _any_value_str(kv["value"]).alias("value"),
            ),
        ),
        lambda p: p["value"].isNotNull(),
    )
    return F.map_from_entries(pairs)


def _nano_ts(nanos_str: Column) -> Column:
    """unixNano (JSON string) → timestamp; 0/absent → NULL
    (convert.rs:338-349: 0 represents missing)."""
    n = nanos_str.cast("long")
    # exact decimal division — double math loses µs at 1.7e18 ns
    us = F.floor(n.cast("decimal(20,0)") / F.lit(1000)).cast("long")
    return F.when(n > 0, F.timestamp_micros(us))


def parse_otlp_logs(
    df: DataFrame,
    payload: str | Column = "payload",
    observed_default: Column | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Decode OTLP/JSON ``ExportLogsServiceRequest`` payloads into flat
    log events — one row per logRecord, reference field names.

    ``observed_default`` stands in for convert.rs's ``Utc::now()`` when
    observedTimeUnixNano is absent (deterministic replay needs a caller
    clock, e.g. the ingest batch watermark). ``keep`` carries envelope
    columns (e.g. a request id) through the explode.
    """
    col = F.col(payload) if isinstance(payload, str) else payload
    req = F.from_json(col, OTLP_LOGS_SCHEMA)
    keep_cols = [F.col(c) for c in (keep or [])]

    rl = df.select(
        *keep_cols, F.explode(req["resourceLogs"]).alias("__rl")
    )
    sl = rl.select(
        *keep_cols,
        F.col("__rl.resource.attributes").alias("__res_attrs"),
        F.explode("__rl.scopeLogs").alias("__sl"),
    )
    lr = sl.select(
        *keep_cols,
        "__res_attrs",
        F.col("__sl.scope").alias("__scope"),
        F.explode("__sl.logRecords").alias("__lr"),
    )

    observed = F.coalesce(
        _nano_ts(F.col("__lr.observedTimeUnixNano")),
        observed_default
        if observed_default is not None
        else F.lit(None).cast("timestamp"),
    )
    rec = F.col("__lr")
    return lr.select(
        *keep_cols,
        _any_value_str(rec["body"]).alias("message"),
        F.coalesce(_nano_ts(rec["timeUnixNano"]), observed).alias(
            "timestamp"
        ),
        observed.alias("observed_timestamp"),
        # empty string = absent in proto3 (convert.rs:302 checks is_empty)
        F.nullif(rec["severityText"], F.lit("")).alias("severity_text"),
        F.when(rec["severityNumber"] > 0, rec["severityNumber"]).alias(
            "severity_number"
        ),
        F.nullif(rec["traceId"], F.lit("")).alias("trace_id"),
        F.nullif(rec["spanId"], F.lit("")).alias("span_id"),
        F.when(rec["flags"] > 0, rec["flags"]).alias("flags"),
        F.coalesce(rec["droppedAttributesCount"], F.lit(0)).alias(
            "dropped_attributes_count"
        ),
        _kv_to_map(rec["attributes"]).alias("attributes"),
        _kv_to_map(F.col("__res_attrs")).alias("resources"),
        F.nullif(F.col("__scope.name"), F.lit("")).alias("scope_name"),
        F.nullif(F.col("__scope.version"), F.lit("")).alias(
            "scope_version"
        ),
    )


# --- traces (ExportTraceServiceRequest) ------------------------------------

_SPAN = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("traceState", T.StringType()),
        T.StructField("parentSpanId", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("endTimeUnixNano", T.StringType()),
        T.StructField("attributes", _KV_LIST),
        T.StructField("droppedAttributesCount", T.IntegerType()),
        T.StructField("droppedEventsCount", T.IntegerType()),
        T.StructField("droppedLinksCount", T.IntegerType()),
        T.StructField(
            "status",
            T.StructType(
                [
                    T.StructField("message", T.StringType()),
                    T.StructField("code", T.IntegerType()),
                ]
            ),
        ),
    ]
)

OTLP_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", _KV_LIST)]
                            ),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "name", T.StringType()
                                                    ),
                                                    T.StructField(
                                                        "version",
                                                        T.StringType(),
                                                    ),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "spans", T.ArrayType(_SPAN)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def parse_otlp_traces(
    df: DataFrame,
    payload: str | Column = "payload",
    keep: list[str] | None = None,
) -> DataFrame:
    """Decode OTLP/JSON ``ExportTraceServiceRequest`` payloads into flat
    span events — one row per ``resourceSpans[] × scopeSpans[] ×
    spans[]`` (reference ResourceSpans::into_event_iter +
    ResourceSpan::into_event, convert.rs:60-76,132-198): trace/span/
    parent ids (OTLP/JSON carries them hex already), trace_state, name,
    kind, ns start/end timestamps (0 = absent → NULL), attributes and
    resource kv-lists → maps, dropped counts, status code/message, and
    the instrumentation scope. Span events/links ride the reference's
    Value trees; here their dropped counts decode and the nested arrays
    are scoped out with the other non-scalar AnyValues (module
    docstring)."""
    col = F.col(payload) if isinstance(payload, str) else payload
    req = F.from_json(col, OTLP_TRACES_SCHEMA)
    keep_cols = [F.col(c) for c in (keep or [])]

    rs = df.select(
        *keep_cols, F.explode(req["resourceSpans"]).alias("__rs")
    )
    ss = rs.select(
        *keep_cols,
        F.col("__rs.resource.attributes").alias("__res_attrs"),
        F.explode("__rs.scopeSpans").alias("__ss"),
    )
    sp = ss.select(
        *keep_cols,
        "__res_attrs",
        F.col("__ss.scope").alias("__scope"),
        F.explode("__ss.spans").alias("__s"),
    )
    s = F.col("__s")
    return sp.select(
        *keep_cols,
        s["traceId"].alias("trace_id"),
        s["spanId"].alias("span_id"),
        s["traceState"].alias("trace_state"),
        s["parentSpanId"].alias("parent_span_id"),
        s["name"].alias("name"),
        F.coalesce(s["kind"], F.lit(0)).alias("kind"),
        _nano_ts(s["startTimeUnixNano"]).alias("start_ts"),
        _nano_ts(s["endTimeUnixNano"]).alias("end_ts"),
        _kv_to_map(s["attributes"]).alias("attributes"),
        F.coalesce(s["droppedAttributesCount"], F.lit(0)).alias(
            "dropped_attributes_count"
        ),
        F.coalesce(s["droppedEventsCount"], F.lit(0)).alias(
            "dropped_events_count"
        ),
        F.coalesce(s["droppedLinksCount"], F.lit(0)).alias(
            "dropped_links_count"
        ),
        F.coalesce(s["status"]["code"], F.lit(0)).alias("status_code"),
        s["status"]["message"].alias("status_message"),
        _kv_to_map(F.col("__res_attrs")).alias("resources"),
        F.col("__scope")["name"].alias("scope_name"),
        F.col("__scope")["version"].alias("scope_version"),
    )
