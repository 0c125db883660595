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
