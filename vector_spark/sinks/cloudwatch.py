"""aws_cloudwatch_logs sink encoder — PutLogEvents request bodies.

Parity: reference ``src/sinks/aws_cloudwatch_logs/request_builder.rs``:
the event's timestamp field is REMOVED and becomes the InputLogEvent
``timestamp`` (epoch millis, :85-117); the remaining event encodes to the
``message`` string. The AWS PutLogEvents API additionally requires the
``logEvents`` array sorted by timestamp ascending — the reference relies
on the service-side ordering guard; here the batch aggregator sorts
``(timestamp, message)`` so a distributed collect is deterministic.

Body shape (the public API's JSON):
``{"logEvents":[{"timestamp":ms,"message":...},...],
"logGroupName":...,"logStreamName":...}``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.functions.native_json import _json_str


def input_log_event(ts_ms: Column, message: Column) -> Column:
    """One InputLogEvent object."""
    return F.concat(
        F.lit('{"timestamp":'), ts_ms.cast("long").cast("string"),
        F.lit(',"message":'), _json_str(message), F.lit("}"),
    )


def put_log_events_body(
    df: DataFrame,
    group_col: str = "log_group",
    stream_col: str = "log_stream",
    ts_ms_col: str = "ts_ms",
    message_col: str = "message",
) -> DataFrame:
    """Batch per (logGroupName, logStreamName) → one body row.

    One shuffle on the (group, stream) key; the sort happens inside the
    collected array (sort_array over (ts, message) structs), not as a
    global orderBy.
    """
    ev = F.struct(
        F.col(ts_ms_col).cast("long").alias("ts"),
        F.col(message_col).alias("msg"),
    )
    grouped = df.groupBy(group_col, stream_col).agg(
        F.sort_array(F.collect_list(ev)).alias("evs")
    )
    body = F.concat(
        F.lit('{"logEvents":['),
        F.array_join(
            F.transform(
                F.col("evs"), lambda e: input_log_event(e["ts"], e["msg"])
            ),
            ",",
        ),
        F.lit('],"logGroupName":'), _json_str(F.col(group_col)),
        F.lit(',"logStreamName":'), _json_str(F.col(stream_col)),
        F.lit("}"),
    )
    return grouped.select(
        group_col, stream_col, F.size("evs").alias("n_events"),
        body.alias("body"),
    )


# --- aws_cloudwatch_metrics (PutMetricData) ------------------------------
#
# Parity: reference src/sinks/aws_cloudwatch_metrics/mod.rs:261-312 —
# counter/gauge -> Value, set -> Value=len(values), distribution ->
# Values/Counts parallel arrays (counts are the sample rates as f64);
# timestamp is epoch-millis when present; tags map to at most 30
# Dimensions in sorted-key order (tags_to_dimensions, :210-216; MetricTags
# iterates its BTreeMap). Kind normalization (mod.rs:190-196: gauges go
# absolute, everything else incremental) happens upstream — the absolute->
# incremental diff is the `aggregate` operator's `diff` strategy
# (operators/aggregate.py), mirroring the reference's shared MetricSet
# machinery. Datum fields render in MetricDatum builder order:
# MetricName, Value | Values+Counts, Timestamp?, Dimensions?.


def dimensions(tags: Column) -> Column:
    """map<string,string> -> Dimensions array JSON (sorted keys, cap 30)."""
    entries = F.slice(F.array_sort(F.map_entries(tags)), 1, 30)
    return F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(
                    F.lit('{"Name":'), _json_str(e["key"]),
                    F.lit(',"Value":'), _json_str(e["value"]), F.lit("}"),
                ),
            ),
            ",",
        ),
        F.lit("]"),
    )


def metric_datum(
    name: Column,
    value: Column | None = None,
    values: Column | None = None,
    counts: Column | None = None,
    ts_ms: Column | None = None,
    tags: Column | None = None,
) -> Column:
    """One PutMetricData MetricDatum as canonical JSON.

    Scalar kinds (counter/gauge/set-cardinality) pass ``value``;
    distributions pass ``values`` + ``counts`` (array<double> columns).
    Exactly one of the two forms must be supplied.
    """
    from vector_spark.functions.native_json import json_f64

    if (value is None) == (values is None):
        raise ValueError("pass exactly one of value / values+counts")
    out = F.concat(F.lit('{"MetricName":'), _json_str(name))
    if value is not None:
        out = F.concat(out, F.lit(',"Value":'), json_f64(value))
    else:
        if counts is None:
            raise ValueError("distribution datum needs counts")
        render = lambda arr: F.array_join(  # noqa: E731
            F.transform(arr, json_f64), ","
        )
        out = F.concat(
            out, F.lit(',"Values":['), render(values),
            F.lit('],"Counts":['), render(counts), F.lit("]"),
        )
    if ts_ms is not None:
        out = F.concat(
            out,
            F.when(
                ts_ms.isNotNull(),
                F.concat(F.lit(',"Timestamp":'),
                         ts_ms.cast("long").cast("string")),
            ).otherwise(F.lit("")),
        )
    if tags is not None:
        out = F.concat(out, F.lit(',"Dimensions":'), dimensions(tags))
    return F.concat(out, F.lit("}"))


def put_metric_data_body(namespace: Column, data: Column) -> Column:
    """Aggregate expression: Namespace + collected datum objects -> one
    PutMetricData body. The 1000-datum API cap maps to the batch key
    (callers chunk oversized groups upstream, firehose-splitter style)."""
    return F.concat(
        F.lit('{"Namespace":'), _json_str(namespace),
        F.lit(',"MetricData":['), F.array_join(data, ","), F.lit("]}"),
    )
