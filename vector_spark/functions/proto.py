"""Protobuf wire-format codec — decode/encode against a field descriptor.

Parity: reference codecs list protobuf among the wire decoders
(lib/codecs/src/decoding/mod.rs:214-254, decoding/format/protobuf.rs takes
a compiled descriptor set). Spark's route would be the spark-protobuf
connector; that jar is not in this distribution and no protobuf Python lib
is either, so this implements the PUBLIC protobuf encoding spec
(https://protobuf.dev/programming-guides/encoding/ — varint tags
``(field_number << 3) | wire_type``, zigzag for sint*, little-endian
fixed32/64, length-delimited strings/bytes, packed repeated scalars) from
scratch inside Arrow-batched pandas UDFs.

Descriptor: ``{field_number: (name, type)}`` or ``(name, type, "repeated")``
with type in int32/int64/uint32/uint64/sint32/sint64/bool/enum/
fixed64/sfixed64/double/fixed32/sfixed32/float/string/bytes — or a nested
descriptor dict for an embedded message (wire type 2, recursively; proto
map<K,V> fields are their spec-defined repeated ``{1: key, 2: value}``
message, so they ride the same path). Unknown fields are skipped on
decode (per spec), missing fields decode to NULL (proto3 presence
semantics).
"""

from __future__ import annotations

import struct as _struct
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_VARINT = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum"}
_FIX64 = {"fixed64", "sfixed64", "double"}
_FIX32 = {"fixed32", "sfixed32", "float"}
_LEN = {"string", "bytes"}

_SPARK = {
    "int32": "int", "sint32": "int", "sfixed32": "int", "uint32": "bigint",
    "fixed32": "bigint", "int64": "bigint", "sint64": "bigint",
    "sfixed64": "bigint", "uint64": "bigint", "fixed64": "bigint",
    "bool": "boolean", "enum": "int", "float": "float", "double": "double",
    "string": "string", "bytes": "binary",
}


def _norm_desc(desc: dict) -> dict[int, tuple[str, Any, bool]]:
    out = {}
    for num, spec in desc.items():
        name, typ = spec[0], spec[1]
        repeated = len(spec) > 2 and spec[2] == "repeated"
        if isinstance(typ, dict):
            _norm_desc(typ)  # validate the nested message descriptor
        elif typ not in _SPARK:
            raise ValueError(f"unsupported proto type {typ!r}")
        out[int(num)] = (name, typ, repeated)
    return out


def spark_schema_of(desc: dict) -> str:
    d = _norm_desc(desc)
    parts = []
    for num in sorted(d):
        name, typ, repeated = d[num]
        t = (
            f"struct<{spark_schema_of(typ)}>"
            if isinstance(typ, dict)
            else _SPARK[typ]
        )
        parts.append(f"`{name}`: {f'array<{t}>' if repeated else t}")
    return ", ".join(parts)


# --- primitives ------------------------------------------------------------


def _write_uvarint(out: bytearray, n: int) -> None:
    n &= 2**64 - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _to_wire(typ: Any, v: Any) -> tuple[int, Any]:
    """(wire_type, raw) for one scalar."""
    if isinstance(typ, dict):
        return 2, v  # embedded message: length-delimited
    if typ in _VARINT:
        if typ == "bool":
            return 0, 1 if v else 0
        n = int(v)
        if typ in ("sint32", "sint64"):
            bits = 32 if typ == "sint32" else 64
            n = (n << 1) ^ (n >> (bits - 1))
        return 0, n
    if typ in _FIX64:
        return 1, v
    if typ in _FIX32:
        return 5, v
    return 2, v  # length-delimited


def _encode_scalar(out: bytearray, typ: Any, v: Any) -> None:
    if isinstance(typ, dict):
        body = encode_message(typ, v)
        _write_uvarint(out, len(body))
        out += body
        return
    wt, raw = _to_wire(typ, v)
    if wt == 0:
        _write_uvarint(out, raw)
    elif wt == 1:
        out += _struct.pack("<d" if typ == "double" else "<q" if typ == "sfixed64" else "<Q",
                            float(raw) if typ == "double" else int(raw))
    elif wt == 5:
        out += _struct.pack("<f" if typ == "float" else "<i" if typ == "sfixed32" else "<I",
                            float(raw) if typ == "float" else int(raw))
    else:
        b = raw.encode("utf-8") if typ == "string" else bytes(raw)
        _write_uvarint(out, len(b))
        out += b


def _decode_scalar(buf: bytes, pos: int, typ: Any) -> tuple[Any, int]:
    if isinstance(typ, dict):
        n, pos = _read_uvarint(buf, pos)
        return decode_message(typ, buf[pos : pos + n]), pos + n
    if typ in _VARINT:
        n, pos = _read_uvarint(buf, pos)
        if typ in ("sint32", "sint64"):
            n = (n >> 1) ^ -(n & 1)
        elif typ in ("int32", "int64"):  # negative ints use 64-bit two's complement
            if n >= 2**63:
                n -= 2**64
        if typ == "bool":
            return n != 0, pos
        if typ in ("int32", "sint32"):
            n = ((n + 2**31) % 2**32) - 2**31  # truncate to int32
        return n, pos
    if typ in _FIX64:
        fmt = "<d" if typ == "double" else "<q" if typ == "sfixed64" else "<Q"
        return _struct.unpack_from(fmt, buf, pos)[0], pos + 8
    if typ in _FIX32:
        fmt = "<f" if typ == "float" else "<i" if typ == "sfixed32" else "<I"
        return _struct.unpack_from(fmt, buf, pos)[0], pos + 4
    n, pos = _read_uvarint(buf, pos)
    raw = buf[pos : pos + n]
    return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_uvarint(buf, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 5:
        return pos + 4
    if wire_type == 2:
        n, pos = _read_uvarint(buf, pos)
        return pos + n
    raise ValueError(f"unsupported wire type {wire_type}")


# --- message ---------------------------------------------------------------


def encode_message(desc: dict, row: dict) -> bytes:
    d = _norm_desc(desc)
    out = bytearray()
    for num in sorted(d):
        name, typ, repeated = d[num]
        v = row.get(name)
        if v is None:
            continue
        if repeated:
            if isinstance(typ, dict) or typ in _LEN:
                # strings/bytes/messages repeat unpacked
                for x in v:
                    _write_uvarint(out, (num << 3) | 2)
                    _encode_scalar(out, typ, x)
            else:  # packed scalars (proto3 default)
                body = bytearray()
                for x in v:
                    _encode_scalar(body, typ, x)
                _write_uvarint(out, (num << 3) | 2)
                _write_uvarint(out, len(body))
                out += body
        else:
            wt, _ = _to_wire(typ, v)
            _write_uvarint(out, (num << 3) | wt)
            _encode_scalar(out, typ, v)
    return bytes(out)


def decode_message(desc: dict, buf: bytes) -> dict:
    d = _norm_desc(desc)
    out: dict[str, Any] = {name: ([] if rep else None) for name, _, rep in d.values()}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if num not in d:
            pos = _skip(buf, pos, wt)
            continue
        name, typ, repeated = d[num]
        if (
            repeated and wt == 2
            and not isinstance(typ, dict) and typ not in _LEN
        ):
            n, pos = _read_uvarint(buf, pos)  # packed block
            end = pos + n
            while pos < end:
                v, pos = _decode_scalar(buf, pos, typ)
                out[name].append(v)
        elif repeated:
            v, pos = _decode_scalar(buf, pos, typ)
            out[name].append(v)
        else:
            out[name], pos = _decode_scalar(buf, pos, typ)
    return out


# --- Spark surface ---------------------------------------------------------


def proto_decode(col: Column, desc: dict) -> Column:
    """binary proto message column → struct column (batch UDF)."""
    d = _norm_desc(desc)
    names = [d[num][0] for num in sorted(d)]
    out_schema = f"struct<{spark_schema_of(desc)}>"

    @pandas_udf(out_schema)
    def _dec(s: pd.Series) -> pd.DataFrame:
        rows = [
            dict.fromkeys(names) if b is None else decode_message(desc, b)
            for b in s
        ]
        return pd.DataFrame(rows, columns=names)

    return _dec(col)


def proto_encode(col: Column, desc: dict) -> Column:
    """struct column → binary proto message column (batch UDF)."""
    _norm_desc(desc)

    @pandas_udf("binary")
    def _enc(df: pd.DataFrame) -> pd.Series:
        return pd.Series([encode_message(desc, r) for r in df.to_dict("records")])

    return _enc(col)
