"""Datadog Agent logs source decode — the inverse of
``sinks/datadog.py``.

Parity: reference ``src/sources/datadog_agent`` (``mod.rs:551-563``
LogMsg + ``logs.rs`` decode_log_body): the agent POSTs a JSON ARRAY of
log objects, each with ``message``, ``status``, ``timestamp`` (epoch
milliseconds), ``hostname``, ``service``, ``ddsource``, ``ddtags`` —
one event per element, all fields string except the timestamp.

Pure JVM ``from_json`` + ``explode``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA = (
    "array<struct<message:string,status:string,timestamp:long,"
    "hostname:string,service:string,ddsource:string,ddtags:string>>"
)


def parse_agent_logs(
    df: DataFrame, body: str | Column = "value"
) -> DataFrame:
    """One agent request body (JSON array) → one row per log object."""
    col = F.col(body) if isinstance(body, str) else body
    m = df.select(F.explode(F.from_json(col, _SCHEMA)).alias("__m"))
    r = F.col("__m")
    return m.select(
        r["message"].alias("message"),
        r["status"].alias("status"),
        F.timestamp_millis(r["timestamp"]).alias("timestamp"),
        r["hostname"].alias("hostname"),
        r["service"].alias("service"),
        r["ddsource"].alias("ddsource"),
        r["ddtags"].alias("ddtags"),
    )
