"""Heroku Logplex drain decode (``heroku_logs`` source).

Parity: reference ``src/sources/heroku_logs.rs`` (line_to_events,
:332-345): each drained line splits on single spaces into exactly 8
parts — ``<octets> <<pri>version> <timestamp> <hostname> <app_name>
<proc_id> <msgid> <message…>`` — taking timestamp/hostname/app_name/
proc_id and the remaining tail as the message; a line that does not
split into 8 parts passes through whole as the message with NULL
metadata (the reference decodes the raw line).

Pure JVM ``split`` with a limit — the message tail keeps its spaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_logplex(
    df: DataFrame, line: str | Column = "value"
) -> DataFrame:
    col = F.col(line) if isinstance(line, str) else line
    p = F.split(col, " ", 8)
    ok = F.size(p) == 8
    part = lambda i: F.when(ok, F.element_at(p, i))  # noqa: E731
    return df.select(
        F.to_timestamp(part(3)).alias("timestamp"),
        part(4).alias("host"),
        part(5).alias("app_name"),
        part(6).alias("proc_id"),
        F.when(ok, F.element_at(p, 8)).otherwise(col).alias("message"),
    )
