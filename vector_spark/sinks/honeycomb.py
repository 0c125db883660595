"""honeycomb sink encoder — batch-events API wire bodies.

Parity: reference ``src/sinks/honeycomb/encoder.rs``: each event becomes
``{"time": <rfc3339, SecondsFormat::Nanos, Z>, "data": {...fields}}``
where the timestamp field is REMOVED from the event before it serializes
into ``data`` (``log.remove_timestamp()``, encoder.rs:35-39); an event
with no timestamp stamps ``Utc::now()`` — a wall-clock dependence that
has no deterministic distributed analog, so here the caller must supply
the timestamp column (null timestamps are the caller's bug, surfaced as
a null ``time``). The request body is a plain JSON array of those
objects (encoder.rs:49).

``SecondsFormat::Nanos`` always renders 9 fractional digits; Spark
timestamps carry micros, so the rendering is the micro rendering + 3
zeros.

All pure JVM column math (whole-stage codegen); the per-batch body is a
``collect_list`` aggregate like the other vendor sinks — one shuffle on
the batch key, bodies assembled map-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rfc3339_nanos(ts: Column) -> Column:
    """chrono ``to_rfc3339_opts(SecondsFormat::Nanos, use_z=true)``."""
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit("000Z"),
    )


def encode_honeycomb_event(ts: Column, data_json: Column) -> Column:
    """One batch-events object. ``data_json`` is the pre-encoded event
    object (timestamp already removed, per the reference's
    ``remove_timestamp``); key order is the caller's contract — use
    sorted/struct-declared order as everywhere else."""
    return F.concat(
        F.lit('{"time":"'), rfc3339_nanos(ts), F.lit('","data":'),
        data_json, F.lit("}"),
    )


def honeycomb_body(objs: Column) -> Column:
    """Aggregate expression: collected event objects → the POST body
    (a bare JSON array). Pass ``F.sort_array(F.collect_list(obj))`` (or
    any deterministic ordering) — the reference preserves arrival order,
    which has no distributed analog."""
    return F.concat(F.lit("["), F.array_join(objs, ","), F.lit("]"))
