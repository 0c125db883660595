"""azure_monitor_logs sink encoder — Log Analytics Data Collector bodies.

Parity: reference ``src/sinks/azure_monitor_logs/sink.rs:80-128``
(JsonEncoding::encode_input): the event's ``timestamp`` field is REMOVED,
re-rendered as RFC 3339 with ``SecondsFormat::Millis`` (always 3
fractional digits + ``Z``), and inserted under the configured
``time_generated_key`` (service default ``TimeGenerated``); events then
serialize as JSON (LogEvent BTreeMap ⇒ sorted keys — the inserted key
sorts INTO position, it is not prepended) and the batch frames as a JSON
array with comma delimiters (CharacterDelimitedEncoder b',').

Field objects arrive as ``map<string,string>`` whose values are
pre-encoded JSON values (same convention as sinks/new_relic.py), so the
sorted-key object and the spliced TimeGenerated come out of one column
expression. Pure JVM column math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.sinks.new_relic import json_object


def rfc3339_millis(ts: Column) -> Column:
    """chrono ``to_rfc3339_opts(SecondsFormat::Millis, use_z=true)``."""
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("Z")
    )


def encode_azure_monitor_log(
    fields: Column,
    ts: Column,
    time_generated_key: str = "TimeGenerated",
) -> Column:
    """One event object with the timestamp re-keyed (see module doc).

    ``fields`` must NOT already contain ``time_generated_key`` or a
    ``timestamp`` key (the reference removed it before insert).
    """
    merged = F.map_concat(
        fields,
        F.create_map(
            F.lit(time_generated_key),
            F.concat(F.lit('"'), rfc3339_millis(ts), F.lit('"')),
        ),
    )
    return json_object(merged)


def azure_body(objs: Column) -> Column:
    """Collected event objects → the comma-delimited array body."""
    return F.concat(F.lit("["), F.array_join(objs, ","), F.lit("]"))
