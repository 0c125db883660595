"""Splunk HEC (HTTP Event Collector) logs encoder.

Parity: reference ``src/sinks/splunk_hec/logs/encoder.rs`` — HecData
serializes in struct-field order ``event, fields, time, host, index,
source, sourcetype`` with every None field skipped; ``event`` is either a
JSON object or a text string; ``fields`` is the indexed-fields object
(Vector's LogEvent object map is a BTreeMap → keys sort); ``time`` is
f64 epoch SECONDS with fractional milliseconds.

``time`` is rendered as ``<secs>.<millis-with-trailing-zeros-trimmed>``
(``.0`` when on the second) — ryu's shortest round-trip form for any
millisecond-precision double, rendered without float formatting so the
JVM's scientific notation for ≥1e7 can never leak into the wire format.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hec_time(ts_ms: Column) -> Column:
    """Epoch-millis → the serde/ryu rendering of the f64 epoch-seconds."""
    secs = F.floor(ts_ms / 1000).cast("long").cast("string")
    frac = (ts_ms % 1000).cast("int")
    frac_str = F.regexp_replace(
        F.lpad(frac.cast("string"), 3, "0"), "0+$", ""
    )
    return F.concat(
        secs, F.lit("."),
        F.when(frac == 0, F.lit("0")).otherwise(frac_str),
    )


def encode_hec_event(
    event: Column,
    event_is_json: bool = False,
    fields: Column | None = None,
    ts_ms: Column | None = None,
    host: Column | None = None,
    index: Column | None = None,
    source: Column | None = None,
    sourcetype: Column | None = None,
) -> Column:
    """One HEC payload object in HecData's serialization order. ``event``
    is a ready JSON value when ``event_is_json`` else a raw text string
    (JSON-escaped here); ``fields`` is a map<string,string> (keys sorted,
    BTreeMap parity); optional metadata renders only when provided."""
    if event_is_json:
        ev = event
    else:
        arr = F.to_json(F.array(event))
        ev = F.substring(arr, 2, F.length(arr) - 2)
    parts = [F.lit('{"event":'), ev]
    if fields is not None:
        parts += [
            F.lit(',"fields":'),
            F.to_json(F.map_from_entries(F.array_sort(F.map_entries(fields)))),
        ]
    else:
        parts += [F.lit(',"fields":{}')]
    if ts_ms is not None:
        parts += [F.lit(',"time":'), hec_time(ts_ms)]
    for key, col in (
        ("host", host), ("index", index),
        ("source", source), ("sourcetype", sourcetype),
    ):
        if col is not None:
            parts += [F.lit(f',"{key}":"'), col.cast("string"), F.lit('"')]
    parts.append(F.lit("}"))
    return F.concat(*parts)
