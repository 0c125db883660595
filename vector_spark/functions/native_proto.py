"""Vector ``native`` codec — the engine's protobuf event wire format.

Parity: reference ``lib/codecs/src/{decoding,encoding}/format/native.rs``
(one prost-encoded ``EventArray`` per frame) with the message layout of
``lib/vector-core/proto/event.proto`` and the conversion rules of
``lib/vector-core/src/event/proto.rs``:

* logs: ``EventArray.logs → LogArray.logs[] → Log``. An object-rooted
  event writes its fields into the deprecated-but-still-primary
  ``Log.fields`` map with ``value`` unset; a non-object root writes the
  dummy ``{".": null}`` fields entry plus ``value`` (proto.rs:292-320).
  Decoding prefers ``value`` and falls back to ``fields``
  (proto.rs:107-117).
* ``Value`` kinds (proto.rs:695-750): raw_bytes=1 (strings),
  timestamp=2 (google.protobuf.Timestamp), integer=4, float=5,
  boolean=6, map=7, array=8, null=9. Decoded timestamps render as
  RFC 3339 AutoSi strings — the same rendering the ``native_json``
  twin uses, so the two codecs' decode outputs agree.
* metrics: ``EventArray.metrics → MetricArray.metrics[] → Metric`` with
  the counter/gauge/set variants, ``kind`` enum, ``namespace``,
  ``timestamp`` and the reference's double tag write (``tags_v1`` AND
  single-value ``tags_v2`` copies, proto.rs:228-247).

The JSON-side representation is the ``native_json`` envelope
(``{"log": {...}}`` / ``{"metric": {...}}``), so
``parse_native_proto(encode_native_proto(x))`` is the identity on
canonical envelopes and the two wire formats are cross-checkable.

Arrow-batched pandas UDFs (a recursive value tree can't be column
math); the per-row work mirrors the reference's per-event prost codec.
"""

from __future__ import annotations

import json
import struct
from datetime import datetime, timezone
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from vector_spark.functions.proto import _read_uvarint, _write_uvarint

__all__ = ["encode_native_proto", "parse_native_proto",
           "event_to_native", "native_to_event"]


def _field(out: bytearray, num: int, wire: int) -> None:
    _write_uvarint(out, (num << 3) | wire)


def _len_field(out: bytearray, num: int, body: bytes) -> None:
    _field(out, num, 2)
    _write_uvarint(out, len(body))
    out += body


def _varint_field(out: bytearray, num: int, v: int) -> None:
    _field(out, num, 0)
    _write_uvarint(out, v & 0xFFFFFFFFFFFFFFFF)


def _ts_body(iso: str) -> bytes:
    dt = datetime.fromisoformat(iso.replace("Z", "+00:00"))
    out = bytearray()
    _varint_field(out, 1, int(dt.timestamp()))
    if dt.microsecond:
        _varint_field(out, 2, dt.microsecond * 1000)
    return bytes(out)


def _auto_si(seconds: int, nanos: int) -> str:
    dt = datetime.fromtimestamp(seconds, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if nanos == 0:
        return base + "Z"
    if nanos % 1_000_000 == 0:
        return f"{base}.{nanos // 1_000_000:03d}Z"
    if nanos % 1_000 == 0:
        return f"{base}.{nanos // 1_000:06d}Z"
    return f"{base}.{nanos:09d}Z"


def _enc_value(v: Any) -> bytes:
    out = bytearray()
    if v is None:
        _varint_field(out, 9, 0)
    elif isinstance(v, bool):
        _varint_field(out, 6, 1 if v else 0)
    elif isinstance(v, int):
        _varint_field(out, 4, v)
    elif isinstance(v, float):
        _field(out, 5, 1)
        out += struct.pack("<d", v)
    elif isinstance(v, str):
        _len_field(out, 1, v.encode("utf-8"))
    elif isinstance(v, dict):
        _len_field(out, 7, _enc_value_map(v))
    elif isinstance(v, (list, tuple)):
        body = bytearray()
        for item in v:
            _len_field(body, 1, _enc_value(item))
        _len_field(out, 8, bytes(body))
    else:
        raise TypeError(f"unsupported value type {type(v).__name__}")
    return bytes(out)


def _enc_value_map(fields: dict) -> bytes:
    out = bytearray()
    _enc_map_entries(out, 1, fields)  # ValueMap.fields entries
    return bytes(out)


def _dec_message(buf: bytes):
    """Yield (field_num, wire_type, scalar_or_bytes) over one message."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_uvarint(buf, pos)
        elif wt == 1:
            v, pos = buf[pos:pos + 8], pos + 8
        elif wt == 2:
            n, pos = _read_uvarint(buf, pos)
            v, pos = buf[pos:pos + n], pos + n
        elif wt == 5:
            v, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield num, wt, v


def _dec_ts(body: bytes) -> str:
    seconds = nanos = 0
    for num, _, v in _dec_message(body):
        if num == 1:
            seconds = v
        elif num == 2:
            nanos = v
    return _auto_si(seconds, nanos)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _dec_value(body: bytes) -> Any:
    for num, _, v in _dec_message(body):
        if num == 1:
            return v.decode("utf-8")
        if num == 2:
            return _dec_ts(v)
        if num == 4:
            return _signed64(v)
        if num == 5:
            return struct.unpack("<d", v)[0]
        if num == 6:
            return bool(v)
        if num == 7:
            return _dec_value_map(v)
        if num == 8:
            items = []
            for n2, _, v2 in _dec_message(v):
                if n2 == 1:
                    items.append(_dec_value(v2))
            return items
        if num == 9:
            return None
    return None  # kind unset


def _dec_value_map(body: bytes) -> dict:
    fields: dict[str, Any] = {}
    for num, _, entry in _dec_message(body):
        if num != 1:
            continue
        k, val = None, None
        for n2, _, v2 in _dec_message(entry):
            if n2 == 1:
                k = v2.decode("utf-8")
            elif n2 == 2:
                val = _dec_value(v2)
        if k is not None:
            fields[k] = val
    return fields


_KINDS = {"incremental": 0, "absolute": 1}
_KINDS_REV = {v: k for k, v in _KINDS.items()}


def _enc_map_entries(out: bytearray, num: int, fields: dict) -> None:
    """map<string, Value> — repeated entry messages at field ``num``."""
    for k in sorted(fields):  # BTreeMap order
        entry = bytearray()
        _len_field(entry, 1, k.encode("utf-8"))
        _len_field(entry, 2, _enc_value(fields[k]))
        _len_field(out, num, bytes(entry))


def _enc_log(event: dict) -> bytes:
    log = bytearray()
    if isinstance(event, dict):
        _enc_map_entries(log, 1, event)  # fields, value unset
    else:
        _enc_map_entries(log, 1, {".": None})  # dummy
        _len_field(log, 2, _enc_value(event))
    return bytes(log)


def _enc_metric(m: dict) -> bytes:
    out = bytearray()
    _len_field(out, 1, m["name"].encode("utf-8"))
    if m.get("timestamp"):
        _len_field(out, 2, _ts_body(m["timestamp"]))
    tags = m.get("tags") or {}
    for k in sorted(tags):
        entry = bytearray()
        _len_field(entry, 1, k.encode("utf-8"))
        _len_field(entry, 2, str(tags[k]).encode("utf-8"))
        _len_field(out, 3, bytes(entry))
    _varint_field(out, 4, _KINDS[m.get("kind", "incremental")])
    if "counter" in m:
        body = bytearray()
        _field(body, 1, 1)
        body += struct.pack("<d", float(m["counter"]["value"]))
        _len_field(out, 5, bytes(body))
    elif "gauge" in m:
        body = bytearray()
        _field(body, 1, 1)
        body += struct.pack("<d", float(m["gauge"]["value"]))
        _len_field(out, 6, bytes(body))
    elif "set" in m:
        body = bytearray()
        for v in m["set"]["values"]:
            _len_field(body, 1, v.encode("utf-8"))
        _len_field(out, 7, bytes(body))
    else:
        raise ValueError("metric variant must be counter/gauge/set")
    if m.get("namespace"):
        _len_field(out, 11, m["namespace"].encode("utf-8"))
    # reference writes single-value copies into tags_v2 too
    # (proto.rs:228-247)
    for k in sorted(tags):
        tv = bytearray()
        _len_field(tv, 1, str(tags[k]).encode("utf-8"))  # TagValue.value
        tvs = bytearray()
        _len_field(tvs, 1, bytes(tv))  # TagValues.values
        entry = bytearray()
        _len_field(entry, 1, k.encode("utf-8"))
        _len_field(entry, 2, bytes(tvs))
        _len_field(out, 20, bytes(entry))
    return bytes(out)


def event_to_native(envelope: str | dict) -> bytes:
    """native_json envelope (string or dict) → EventArray frame bytes."""
    ev = json.loads(envelope) if isinstance(envelope, str) else envelope
    out = bytearray()
    if "log" in ev:
        arr = bytearray()
        _len_field(arr, 1, _enc_log(ev["log"]))
        _len_field(out, 1, bytes(arr))  # EventArray.logs
    elif "metric" in ev:
        arr = bytearray()
        _len_field(arr, 1, _enc_metric(ev["metric"]))
        _len_field(out, 2, bytes(arr))  # EventArray.metrics
    else:
        raise ValueError("envelope must contain 'log' or 'metric'")
    return bytes(out)


def _dec_log(body: bytes) -> dict:
    fields: dict[str, Any] = {}
    value = None
    has_value = False
    for num, _, v in _dec_message(body):
        if num == 1:
            _dec_map_entry(v, fields)
        elif num == 2:
            value, has_value = _dec_value(v), True
    if has_value:
        return {"log": value}
    return {"log": fields}


def _dec_map_entry(entry: bytes, fields: dict) -> None:
    k, val = None, None
    for n2, _, v2 in _dec_message(entry):
        if n2 == 1:
            k = v2.decode("utf-8")
        elif n2 == 2:
            val = _dec_value(v2)
    if k is not None:
        fields[k] = val


def _dec_metric(body: bytes) -> dict:
    m: dict[str, Any] = {}
    tags: dict[str, str] = {}
    kind = 0
    for num, _, v in _dec_message(body):
        if num == 1:
            m["name"] = v.decode("utf-8")
        elif num == 2:
            m["timestamp"] = _dec_ts(v)
        elif num == 3:
            _dec_str_entry(v, tags)
        elif num == 4:
            kind = v
        elif num == 5:
            m["counter"] = {"value": _dec_double_field(v)}
        elif num == 6:
            m["gauge"] = {"value": _dec_double_field(v)}
        elif num == 7:
            vals = [v2.decode("utf-8")
                    for n2, _, v2 in _dec_message(v) if n2 == 1]
            m["set"] = {"values": sorted(vals)}
        elif num == 11:
            m["namespace"] = v.decode("utf-8")
    if tags:
        m["tags"] = tags
    m["kind"] = _KINDS_REV[kind]
    return {"metric": m}


def _dec_str_entry(entry: bytes, into: dict) -> None:
    k = val = None
    for n2, _, v2 in _dec_message(entry):
        if n2 == 1:
            k = v2.decode("utf-8")
        elif n2 == 2:
            val = v2.decode("utf-8")
    if k is not None:
        into[k] = val


def _dec_double_field(body: bytes) -> float:
    for num, _, v in _dec_message(body):
        if num == 1:
            return struct.unpack("<d", v)[0]
    return 0.0


def native_to_event(frame: bytes) -> str:
    """EventArray frame bytes → canonical native_json envelope string
    (sorted keys, like the BTreeMap-backed reference serde)."""
    for num, _, v in _dec_message(bytes(frame)):
        if num == 1:  # LogArray
            for n2, _, v2 in _dec_message(v):
                if n2 == 1:
                    return json.dumps(_dec_log(v2), sort_keys=True,
                                      separators=(",", ":"))
        elif num == 2:  # MetricArray
            for n2, _, v2 in _dec_message(v):
                if n2 == 1:
                    return json.dumps(_dec_metric(v2), sort_keys=True,
                                      separators=(",", ":"))
    raise ValueError("empty or unsupported EventArray frame")


def encode_native_proto(col: Column) -> Column:
    """native_json envelope string column → EventArray frame binary."""

    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else event_to_native(x))

    return _enc(col)


def parse_native_proto(col: Column) -> Column:
    """EventArray frame binary column → canonical envelope string."""

    @pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else native_to_event(b))

    return _dec(col)
