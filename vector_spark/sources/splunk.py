"""Splunk HEC (HTTP Event Collector) source decode — the inverse of
``sinks/splunk.py``.

Parity: reference ``src/sources/splunk_hec/mod.rs``:

- each request line is a HEC JSON object: ``event`` (text or object),
  ``fields`` (indexed fields), ``time``, ``host``, ``index``,
  ``source``, ``sourcetype``, ``channel``;
- ``time`` accepts a JSON number or a numeric string (mod.rs:752-756);
  an INTEGER value disambiguates units by magnitude (parse_timestamp,
  mod.rs:926-945: seconds below the year-2400 cutoff 13569465600,
  then milliseconds below 253402300800000, else nanoseconds); a FLOAT
  value is epoch seconds with fraction;
- metadata lands under the source's names (mod.rs:64-66): ``host``,
  ``splunk_index``, ``splunk_source``, ``splunk_sourcetype``,
  ``splunk_channel`` (header/query default available per request);
- a text ``event`` becomes the message; an object ``event`` passes
  through as JSON (vector-namespace build, mod.rs:817+) — flagged here
  with ``event_is_json``.

Pure JVM columns (``get_json_object`` + ``from_json``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEC_CUTOFF = 13_569_465_600  # 2400-01-01 (mod.rs:928)
MILLISEC_CUTOFF = 253_402_300_800_000  # 10000-01-01 millis (mod.rs:930)


def hec_parse_time(t: Column) -> Column:
    """HEC ``time`` (numeric string) → timestamp per parse_timestamp's
    magnitude cutoffs; floats are epoch seconds; negatives → NULL."""
    d = t.try_cast("double")
    is_int = t.rlike(r"^\d+$")
    i = t.try_cast("long")
    return F.when(d < 0, F.lit(None).cast("timestamp")).when(
        is_int,
        F.when(i < SEC_CUTOFF, F.timestamp_seconds(i))
        .when(i < MILLISEC_CUTOFF, F.timestamp_millis(i))
        .otherwise(
            F.timestamp_micros(
                F.floor(i.cast("decimal(20,0)") / F.lit(1000)).cast("long")
            )
        ),
    ).otherwise(F.timestamp_seconds(d))


def parse_hec_events(
    df: DataFrame,
    line: str | Column = "value",
    default_channel: Column | None = None,
) -> DataFrame:
    """Decode HEC event JSON lines into flat rows: ``message`` (text
    event, or the event's JSON when ``event_is_json``), ``timestamp``
    (NULL when the request carries no time — the server clock is the
    reference's fallback, a caller concern here), ``fields`` map, and
    the splunk_* metadata."""
    col = F.col(line) if isinstance(line, str) else line
    j = lambda p: F.get_json_object(col, "$." + p)  # noqa: E731
    ev_raw = j("event")
    return df.select(
        ev_raw.alias("message"),
        F.coalesce(ev_raw.startswith("{") | ev_raw.startswith("["),
                   F.lit(False)).alias("event_is_json"),
        hec_parse_time(j("time")).alias("timestamp"),
        F.from_json(j("fields"), "map<string,string>").alias("fields"),
        j("host").alias("host"),
        F.coalesce(
            j("channel"),
            default_channel
            if default_channel is not None
            else F.lit(None).cast("string"),
        ).alias("splunk_channel"),
        j("index").alias("splunk_index"),
        j("source").alias("splunk_source"),
        j("sourcetype").alias("splunk_sourcetype"),
    )
