"""Avro binary codec — decode/encode for flat record schemas.

Parity: reference codecs enumerate avro among the wire decoders
(lib/codecs/src/decoding/mod.rs:214-254). Spark's own route would be the
spark-avro connector (``from_avro``/``to_avro``); that jar is not in this
distribution, so this module implements the PUBLIC Avro 1.11 binary
encoding (https://avro.apache.org/docs/1.11.1/specification/ — zigzag
varints, length-prefixed utf8/bytes, IEEE little-endian floats, block
arrays, union index prefix) from scratch inside Arrow-batched pandas UDFs.
Per-row byte walking is unavoidable for a record codec (the connector does
the same JVM-side); batches arrive via Arrow so there is no per-row Python
*dispatch*.

Supported schema subset: records of primitives (null/boolean/int/long/
float/double/string/bytes), nullable unions ``["null", T]`` / ``[T,
"null"]``, and — recursively — nested records, arrays, and maps of any
supported type (OTLP-style payloads nest; the wire spec's recursive
grammar maps 1:1 onto Spark struct/array/map types). Multi-branch
non-null unions and named-type references stay loud ``ValueError``s.
"""

from __future__ import annotations

import struct as _struct
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)
from pyspark.sql.functions import pandas_udf

_PRIMITIVES = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


# --- varint / zigzag (Avro spec: "Binary encoding > primitive types") ------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n) & (2**64 - 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc), pos
        shift += 7


# --- schema handling -------------------------------------------------------


def _field_kind(t: Any) -> tuple[Any, bool, bool]:
    """Returns ``(kind, nullable, null_first)``.

    ``kind`` is the recursive type descriptor: a primitive name, or
    ``("array", item_triple)`` / ``("map", value_triple)`` /
    ``("record", [(name, kind, nullable, null_first), ...])`` — the
    Avro spec's recursive grammar. ``null_first`` preserves the union
    branch ORDER as written (the union index on the wire is positional,
    spec "Binary encoding > complex types > unions")."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(t) != 2 or len(non_null) != 1:
            raise ValueError(f"only 2-branch null unions supported, got {t}")
        base, inner_nullable, _ = _field_kind(non_null[0])
        if inner_nullable:
            raise ValueError(f"nested nullable union in {t}")
        return base, True, t[0] == "null"
    if isinstance(t, dict):
        tt = t.get("type")
        if tt == "array":
            return ("array", _field_kind(t["items"])), False, True
        if tt == "map":
            return ("map", _field_kind(t["values"])), False, True
        if tt == "record":
            return ("record", _fields_of(t)), False, True
        if isinstance(tt, (str, list, dict)) and tt not in (
            "array", "map", "record",
        ):
            return _field_kind(tt)  # {"type": "string"} wrapper form
        raise ValueError(f"unsupported complex type {tt}")
    if t not in _PRIMITIVES:
        raise ValueError(f"unsupported avro type {t!r}")
    return t, False, True


def _fields_of(schema: dict) -> list[tuple[str, Any, bool, bool]]:
    return [
        (f["name"], *_field_kind(f["type"])) for f in schema["fields"]
    ]


def _spark_type(kind: Any) -> str:
    if isinstance(kind, tuple):
        tag, inner = kind
        if tag == "array":
            return f"array<{_spark_type(inner[0])}>"
        if tag == "map":
            return f"map<string,{_spark_type(inner[0])}>"
        if tag == "record":
            inner_fields = ", ".join(
                f"`{n}`: {_spark_type(k)}" for n, k, _, _ in inner
            )
            return f"struct<{inner_fields}>"
    return _PRIMITIVES[kind]


def record_fields(schema: dict) -> list[tuple[str, Any, bool, bool]]:
    """[(name, kind, nullable, null_first)] for a record schema."""
    if schema.get("type") != "record":
        raise ValueError("schema must be an avro record")
    return _fields_of(schema)


def spark_schema_of(schema: dict) -> str:
    return ", ".join(
        f"`{n}`: {_spark_type(k)}" for n, k, _, _ in record_fields(schema)
    )


# --- one-value encode/decode ----------------------------------------------


def _encode_triple(
    out: bytearray, triple: tuple[Any, bool, bool], v: Any, name: str = "?"
) -> None:
    """Encode one (possibly nullable-union) value."""
    kind, nullable, null_first = triple
    if nullable:
        # union index: branch order as written in the schema
        if v is None:
            _write_varint(out, 0 if null_first else 1)
            return
        _write_varint(out, 1 if null_first else 0)
    elif v is None:
        raise ValueError(f"field {name} is not nullable")
    _encode_value(out, kind, v)


def _encode_value(out: bytearray, kind: Any, v: Any) -> None:
    if isinstance(kind, tuple):
        tag, inner = kind
        if tag == "array":
            items = list(v)
            if items:
                _write_varint(out, len(items))  # one block
                for x in items:
                    _encode_triple(out, inner, x)
            _write_varint(out, 0)  # end of blocks
            return
        if tag == "map":
            entries = list(v.items()) if isinstance(v, dict) else list(v)
            if entries:
                _write_varint(out, len(entries))
                for mk, mv in entries:
                    _encode_value(out, "string", mk)
                    _encode_triple(out, inner, mv)
            _write_varint(out, 0)
            return
        # nested record: field order is the schema's field order
        for name, fk, fnull, fnf in inner:
            _encode_triple(out, (fk, fnull, fnf), v.get(name), name)
        return
    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if v else 0)
    elif kind in ("int", "long"):
        _write_varint(out, int(v))
    elif kind == "float":
        out += _struct.pack("<f", float(v))
    elif kind == "double":
        out += _struct.pack("<d", float(v))
    elif kind == "string":
        b = str(v).encode("utf-8")
        _write_varint(out, len(b))
        out += b
    elif kind == "bytes":
        b = bytes(v)
        _write_varint(out, len(b))
        out += b
    else:  # pragma: no cover
        raise ValueError(kind)


def _decode_triple(
    buf: bytes, pos: int, triple: tuple[Any, bool, bool]
) -> tuple[Any, int]:
    kind, nullable, null_first = triple
    if nullable:
        idx, pos = _read_varint(buf, pos)
        if (idx == 0) == null_first:
            return None, pos
    return _decode_value(buf, pos, kind)


def _decode_value(buf: bytes, pos: int, kind: Any) -> tuple[Any, int]:
    if isinstance(kind, tuple):
        tag, inner = kind
        if tag == "array":
            acc = []
            while True:
                n, pos = _read_varint(buf, pos)
                if n == 0:
                    return acc, pos
                if n < 0:  # block with byte-size prefix (spec form)
                    n = -n
                    _, pos = _read_varint(buf, pos)
                for _ in range(n):
                    x, pos = _decode_triple(buf, pos, inner)
                    acc.append(x)
        if tag == "map":
            m: dict[str, Any] = {}
            while True:
                n, pos = _read_varint(buf, pos)
                if n == 0:
                    return m, pos
                if n < 0:
                    n = -n
                    _, pos = _read_varint(buf, pos)
                for _ in range(n):
                    mk, pos = _decode_value(buf, pos, "string")
                    m[mk], pos = _decode_triple(buf, pos, inner)
        rec: dict[str, Any] = {}
        for name, fk, fnull, fnf in inner:
            rec[name], pos = _decode_triple(buf, pos, (fk, fnull, fnf))
        return rec, pos
    if kind == "null":
        return None, pos
    if kind == "boolean":
        return buf[pos] != 0, pos + 1
    if kind == "int" or kind == "long":
        return _read_varint(buf, pos)
    if kind == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "string":
        n, pos = _read_varint(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if kind == "bytes":
        n, pos = _read_varint(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(kind)  # pragma: no cover


def encode_record(schema: dict, row: dict) -> bytes:
    """One record → avro binary body (no container-file framing)."""
    out = bytearray()
    for name, kind, nullable, null_first in record_fields(schema):
        _encode_triple(out, (kind, nullable, null_first), row.get(name), name)
    return bytes(out)


def decode_record(schema: dict, buf: bytes) -> dict:
    out: dict[str, Any] = {}
    pos = 0
    for name, kind, nullable, null_first in record_fields(schema):
        out[name], pos = _decode_triple(buf, pos, (kind, nullable, null_first))
    return out


def schema_field_types(schema: dict) -> dict[str, list]:
    return {
        f["name"]: (f["type"] if isinstance(f["type"], list) else [f["type"]])
        for f in schema["fields"]
    }


# --- Spark surface ---------------------------------------------------------


def avro_decode(col: Column, schema: dict) -> Column:
    """binary avro record column → struct column (vectorized batch UDF)."""
    fields = record_fields(schema)  # validate up front, fail fast
    names = [n for n, _, _, _ in fields]
    out_schema = f"struct<{spark_schema_of(schema)}>"

    @pandas_udf(out_schema)
    def _dec(s: pd.Series) -> pd.DataFrame:
        rows = [
            dict.fromkeys(names) if b is None else decode_record(schema, b)
            for b in s
        ]
        return pd.DataFrame(rows, columns=names)

    return _dec(col)


def avro_encode(col: Column, schema: dict) -> Column:
    """struct column → binary avro record column (vectorized batch UDF)."""
    record_fields(schema)  # validate

    @pandas_udf("binary")
    def _enc(df: pd.DataFrame) -> pd.Series:
        recs = df.to_dict("records")
        return pd.Series([encode_record(schema, r) for r in recs])

    return _enc(col)
