"""fluent source — Fluentd/Fluent Bit forward-protocol (msgpack) decoder.

Parity: reference ``src/sources/fluent/message.rs`` — the forward
protocol's three encodings of an event batch (the spec's fourth,
CompressedPackedForward, is PackedForward + gzip):

* ``Message``:        ``[tag, time, record]`` (+ optional options map)
* ``Forward``:        ``[tag, [[time, record], ...]]`` (+ options)
* ``PackedForward``:  ``[tag, <bin of concatenated [time, record]>]``
  with ``options.compressed == "gzip"`` marking the compressed variant
  (message.rs:19-52); ``time`` is a unix-seconds integer or Fluent's
  EventTime msgpack extension (ext type 0, 4-byte BE seconds + 4-byte BE
  nanoseconds — message.rs:62-128).

No msgpack Python library ships in this distribution, so — exactly like
the avro/protobuf modules — this implements the PUBLIC MessagePack spec
(https://github.com/msgpack/msgpack/blob/master/spec.md) from scratch:
nil/bool, all int widths, float32/64, fixstr/str8-32, bin8-32,
fixarray/array16-32, fixmap/map16-32, fixext/ext8 (EventTime). The Spark
surface is an Arrow-batched ``mapInPandas`` iterator (bounded memory, no
per-row Python in the JVM plan; the per-byte work IS the decoder, the
same place the reference spends it). Each decoded entry becomes one
output row ``(tag, event_ts, record)`` with the record rendered as
canonical sorted-key JSON — the log-event shape the reference builds in
``src/sources/fluent/mod.rs:325-400`` (tag + timestamp + record fields).

The module also provides the matching encoder (message/forward/packed
forward) so tests and gate queries can synthesize deterministic wire
bytes; Vector itself has no fluent sink, so the encoder is a test vector
generator, not a sink claim.
"""

from __future__ import annotations

import gzip as _gzip
import json
import struct as _struct
from datetime import datetime, timezone
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_UTC = timezone.utc


class EventTime:
    """Fluent EventTime ext value (seconds + nanoseconds)."""

    __slots__ = ("secs", "nanos")

    def __init__(self, secs: int, nanos: int = 0):
        self.secs, self.nanos = secs, nanos

    def to_epoch_us(self) -> int:
        return self.secs * 1_000_000 + self.nanos // 1000


# ---------------------------------------------------------------------------
# msgpack encode (test-vector generator)
# ---------------------------------------------------------------------------

def pack(obj: Any) -> bytes:
    if obj is None:
        return b"\xc0"
    if obj is True:
        return b"\xc3"
    if obj is False:
        return b"\xc2"
    if isinstance(obj, EventTime):
        return b"\xd7\x00" + _struct.pack(">II", obj.secs, obj.nanos)
    if isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            return _struct.pack("B", obj)
        if -32 <= obj < 0:
            return _struct.pack("b", obj)
        if 0 <= obj <= 0xFF:
            return b"\xcc" + _struct.pack("B", obj)
        if 0 <= obj <= 0xFFFF:
            return b"\xcd" + _struct.pack(">H", obj)
        if 0 <= obj <= 0xFFFFFFFF:
            return b"\xce" + _struct.pack(">I", obj)
        if obj >= 0:
            return b"\xcf" + _struct.pack(">Q", obj)
        if obj >= -0x80:
            return b"\xd0" + _struct.pack("b", obj)
        if obj >= -0x8000:
            return b"\xd1" + _struct.pack(">h", obj)
        if obj >= -0x80000000:
            return b"\xd2" + _struct.pack(">i", obj)
        return b"\xd3" + _struct.pack(">q", obj)
    if isinstance(obj, float):
        return b"\xcb" + _struct.pack(">d", obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) <= 31:
            return _struct.pack("B", 0xA0 | len(b)) + b
        if len(b) <= 0xFF:
            return b"\xd9" + _struct.pack("B", len(b)) + b
        if len(b) <= 0xFFFF:
            return b"\xda" + _struct.pack(">H", len(b)) + b
        return b"\xdb" + _struct.pack(">I", len(b)) + b
    if isinstance(obj, (bytes, bytearray)):
        b = bytes(obj)
        if len(b) <= 0xFF:
            return b"\xc4" + _struct.pack("B", len(b)) + b
        if len(b) <= 0xFFFF:
            return b"\xc5" + _struct.pack(">H", len(b)) + b
        return b"\xc6" + _struct.pack(">I", len(b)) + b
    if isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            head = _struct.pack("B", 0x90 | n)
        elif n <= 0xFFFF:
            head = b"\xdc" + _struct.pack(">H", n)
        else:
            head = b"\xdd" + _struct.pack(">I", n)
        return head + b"".join(pack(x) for x in obj)
    if isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            head = _struct.pack("B", 0x80 | n)
        elif n <= 0xFFFF:
            head = b"\xde" + _struct.pack(">H", n)
        else:
            head = b"\xdf" + _struct.pack(">I", n)
        return head + b"".join(pack(k) + pack(v) for k, v in obj.items())
    raise TypeError(f"cannot msgpack {type(obj)!r}")


def encode_message(tag: str, time: int | EventTime, record: dict,
                   options: dict | None = None) -> bytes:
    arr: list[Any] = [tag, time, record]
    if options is not None:
        arr.append(options)
    return pack(arr)


def encode_forward(tag: str, entries: list[tuple[int | EventTime, dict]],
                   options: dict | None = None) -> bytes:
    arr: list[Any] = [tag, [[t, r] for t, r in entries]]
    if options is not None:
        arr.append(options)
    return pack(arr)


def encode_packed_forward(
    tag: str, entries: list[tuple[int | EventTime, dict]],
    compressed: bool = False,
) -> bytes:
    blob = b"".join(pack([t, r]) for t, r in entries)
    options: dict[str, Any] = {"size": len(entries)}
    if compressed:
        blob = _gzip.compress(blob, mtime=0)
        options["compressed"] = "gzip"
    return pack([tag, blob, options])


# ---------------------------------------------------------------------------
# msgpack decode
# ---------------------------------------------------------------------------

def _take(buf: bytes, off: int, n: int) -> bytes:
    if off + n > len(buf):
        raise ValueError("truncated msgpack")
    return buf[off:off + n]


def unpack(buf: bytes, off: int = 0) -> tuple[Any, int]:
    """Decode one msgpack value; returns (value, next offset)."""
    b = buf[off]
    off += 1
    if b <= 0x7F:
        return b, off
    if b >= 0xE0:
        return b - 0x100, off
    if 0x80 <= b <= 0x8F:
        return _unpack_map(buf, off, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(buf, off, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return _take(buf, off, n).decode("utf-8"), off + n
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b in (0xC4, 0xC5, 0xC6):
        w = {0xC4: "B", 0xC5: ">H", 0xC6: ">I"}[b]
        sz = _struct.calcsize(w)
        (n,) = _struct.unpack(w, _take(buf, off, sz))
        off += sz
        return bytes(_take(buf, off, n)), off + n
    if b == 0xCA:
        (v,) = _struct.unpack(">f", _take(buf, off, 4))
        return v, off + 4
    if b == 0xCB:
        (v,) = _struct.unpack(">d", _take(buf, off, 8))
        return v, off + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        w = {0xCC: "B", 0xCD: ">H", 0xCE: ">I", 0xCF: ">Q"}[b]
        sz = _struct.calcsize(w)
        (v,) = _struct.unpack(w, _take(buf, off, sz))
        return v, off + sz
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        w = {0xD0: "b", 0xD1: ">h", 0xD2: ">i", 0xD3: ">q"}[b]
        sz = _struct.calcsize(w)
        (v,) = _struct.unpack(w, _take(buf, off, sz))
        return v, off + sz
    if b in (0xD9, 0xDA, 0xDB):
        w = {0xD9: "B", 0xDA: ">H", 0xDB: ">I"}[b]
        sz = _struct.calcsize(w)
        (n,) = _struct.unpack(w, _take(buf, off, sz))
        off += sz
        return _take(buf, off, n).decode("utf-8"), off + n
    if b in (0xDC, 0xDD):
        w = ">H" if b == 0xDC else ">I"
        sz = _struct.calcsize(w)
        (n,) = _struct.unpack(w, _take(buf, off, sz))
        return _unpack_array(buf, off + sz, n)
    if b in (0xDE, 0xDF):
        w = ">H" if b == 0xDE else ">I"
        sz = _struct.calcsize(w)
        (n,) = _struct.unpack(w, _take(buf, off, sz))
        return _unpack_map(buf, off + sz, n)
    if b == 0xD7:  # fixext8 — EventTime lives here (type 0)
        typ = buf[off]
        data = _take(buf, off + 1, 8)
        off += 9
        if typ == 0:
            secs, nanos = _struct.unpack(">II", data)
            return EventTime(secs, nanos), off
        return (typ, bytes(data)), off
    if b == 0xC7:  # ext8 — the reference also accepts EventTime as ext8 len 8
        n = buf[off]
        typ = buf[off + 1]
        data = _take(buf, off + 2, n)
        off += 2 + n
        if typ == 0 and n == 8:
            secs, nanos = _struct.unpack(">II", data)
            return EventTime(secs, nanos), off
        return (typ, bytes(data)), off
    raise ValueError(f"unsupported msgpack byte 0x{b:02x}")


def _unpack_array(buf: bytes, off: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, off = unpack(buf, off)
        out.append(v)
    return out, off


def _unpack_map(buf: bytes, off: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, off = unpack(buf, off)
        v, off = unpack(buf, off)
        out[k] = v
    return out, off


# ---------------------------------------------------------------------------
# forward-protocol message → entries
# ---------------------------------------------------------------------------

def _ts_to_dt(t: Any) -> datetime:
    if isinstance(t, EventTime):
        return datetime.fromtimestamp(t.secs, tz=_UTC).replace(
            microsecond=t.nanos // 1000)
    return datetime.fromtimestamp(int(t), tz=_UTC)


def _canon_json(record: dict) -> str:
    def default(v: Any) -> str:
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).decode("utf-8", "replace")
        raise TypeError(type(v))

    return json.dumps(record, sort_keys=True, separators=(",", ":"),
                      default=default)


def decode_fluent_message(buf: bytes) -> list[tuple[str, datetime, str]]:
    """One wire message → [(tag, event_ts, canonical-JSON record), ...].

    Handles all three encodings + gzip decompression, mirroring the
    FluentMessage match arms in the reference (mod.rs:325-400).
    """
    msg, _ = unpack(bytes(buf), 0)
    if not isinstance(msg, list) or len(msg) < 2:
        raise ValueError("not a fluent message")
    tag = msg[0]
    second = msg[1]
    if isinstance(second, list):  # Forward mode
        return [
            (tag, _ts_to_dt(t), _canon_json(rec)) for t, rec in second
        ]
    if isinstance(second, (bytes, bytearray)):  # PackedForward
        blob = bytes(second)
        options = msg[2] if len(msg) > 2 and isinstance(msg[2], dict) else {}
        if options.get("compressed") == "gzip":
            blob = _gzip.decompress(blob)
        out = []
        off = 0
        while off < len(blob):
            entry, off = unpack(blob, off)
            t, rec = entry
            out.append((tag, _ts_to_dt(t), _canon_json(rec)))
        return out
    # Message mode
    return [(tag, _ts_to_dt(second), _canon_json(msg[2]))]


def parse_fluent(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "event_id") -> DataFrame:
    """Decode a binary column of forward-protocol messages.

    One input row = one wire message; output = one row per decoded entry
    ``(id_col, tag, event_ts, record)``. Arrow-batched iterator keeps
    memory bounded at corpus scale; undecodable payloads yield zero rows
    (the reference NACKs the chunk and drops it).
    """
    out_schema = f"{id_col} bigint, tag string, event_ts timestamp, record string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tags, times, recs = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    entries = decode_fluent_message(payload)
                except (ValueError, IndexError, KeyError, TypeError):
                    continue
                for tag, ts, rec in entries:
                    ids.append(rid)
                    tags.append(tag)
                    times.append(ts.replace(tzinfo=None))
                    recs.append(rec)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "tag": tags,
                 "event_ts": pd.Series(times, dtype="datetime64[us]"),
                 "record": recs}
            )

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)
