"""OpenTelemetry (OTLP/JSON) logs sink encode.

Parity: reference ``src/sinks/opentelemetry/mod.rs`` (the sink is an
HTTP transport around a codec) + the inverse of the source mapping in
``lib/opentelemetry-proto/src/convert.rs``: flat log events serialize to
``ExportLogsServiceRequest`` JSON — records group by their resource
attribute set into one ``resourceLogs`` entry each, a single scope block
carries the emitting library name, and each event becomes a
``logRecords`` element with proto-JSON field spelling (camelCase,
64-bit nanos as strings, AnyValue body/attribute wrappers).

Determinism at cluster scale: resource grouping keys on the SORTED
attribute entries, attributes inside every kv-list sort by key, and
logRecords sort by (timeUnixNano, record JSON) — same canonicalization
the loki encoder uses for Rust-HashMap-order fields.

Pure column expressions; string escaping rides Spark's ``to_json``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _json_str(s: Column) -> Column:
    """JSON-escaped quoted string via to_json on a 1-element array."""
    arr = F.to_json(F.array(s))
    return F.substring(arr, 2, F.length(arr) - 2)


def _kv_json(m: Column) -> Column:
    """map<string,string> → ``[{"key":k,"value":{"stringValue":v}},…]``
    sorted by key (proto-JSON attribute list)."""
    entries = F.array_sort(F.map_entries(m))
    return F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(
                    F.lit('{"key":'),
                    _json_str(e["key"]),
                    F.lit(',"value":{"stringValue":'),
                    _json_str(e["value"]),
                    F.lit("}}"),
                ),
            ),
            ",",
        ),
        F.lit("]"),
    )


def log_record_json(
    message: Column,
    ts_ns: Column,
    severity_number: Column | None = None,
    severity_text: Column | None = None,
    attributes: Column | None = None,
    trace_id: Column | None = None,
    span_id: Column | None = None,
) -> Column:
    """One ``logRecords`` element. Optional fields are omitted when the
    column is NULL (proto3 absent-field semantics, mirroring the source
    decode's >0 / non-empty checks)."""
    parts: list[Column] = [
        F.concat(F.lit('"timeUnixNano":"'), ts_ns.cast("string"), F.lit('"'))
    ]
    if severity_number is not None:
        parts.append(
            F.when(
                severity_number.isNotNull(),
                F.concat(
                    F.lit('"severityNumber":'),
                    severity_number.cast("string"),
                ),
            )
        )
    if severity_text is not None:
        parts.append(
            F.when(
                severity_text.isNotNull(),
                F.concat(F.lit('"severityText":'), _json_str(severity_text)),
            )
        )
    parts.append(
        F.concat(F.lit('"body":{"stringValue":'), _json_str(message), F.lit("}"))
    )
    if attributes is not None:
        parts.append(F.concat(F.lit('"attributes":'), _kv_json(attributes)))
    if trace_id is not None:
        parts.append(
            F.when(
                trace_id.isNotNull(),
                F.concat(F.lit('"traceId":'), _json_str(trace_id)),
            )
        )
    if span_id is not None:
        parts.append(
            F.when(
                span_id.isNotNull(),
                F.concat(F.lit('"spanId":'), _json_str(span_id)),
            )
        )
    body = F.array_join(
        F.filter(F.array(*parts), lambda p: p.isNotNull()), ","
    )
    return F.concat(F.lit("{"), body, F.lit("}"))


def resource_logs(
    df: DataFrame,
    resource: Column,
    record: Column,
    ts_ns: Column,
    scope_name: Column | None = None,
) -> DataFrame:
    """Group encoded records into one ``resourceLogs`` JSON entry per
    resource attribute set.

    Output: ``resource_key`` (sorted ``k,v,`` grouping string),
    ``n_records``, ``resource_json`` (the full entry). The request body
    is ``{"resourceLogs":[…]}`` over the collected entries — batch
    assembly happens at the HTTP writer, exactly like the loki/ES sinks.
    """
    scope = scope_name if scope_name is not None else F.lit("vector-spark")
    keyed = df.select(
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(F.map_entries(resource)),
                    lambda e: F.array(e["key"], e["value"]),
                )
            ),
            ",",
        ).alias("resource_key"),
        _kv_json(resource).alias("__res_json"),
        F.struct(
            ts_ns.cast("long").alias("ts_ns"), record.alias("rec")
        ).alias("__entry"),
        scope.alias("__scope"),
    )
    agg = keyed.groupBy("resource_key").agg(
        F.first("__res_json").alias("__res_json"),
        F.first("__scope").alias("__scope"),
        F.count(F.lit(1)).cast("int").alias("n_records"),
        F.array_sort(F.collect_list("__entry")).alias("__entries"),
    )
    records = F.array_join(
        F.transform(F.col("__entries"), lambda e: e["rec"]), ","
    )
    return agg.select(
        "resource_key",
        "n_records",
        F.concat(
            F.lit('{"resource":{"attributes":'),
            F.col("__res_json"),
            F.lit('},"scopeLogs":[{"scope":{"name":'),
            _json_str(F.col("__scope")),
            F.lit('},"logRecords":['),
            records,
            F.lit("]}]}"),
        ).alias("resource_json"),
    )
