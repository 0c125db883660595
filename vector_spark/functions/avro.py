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

Supported schema subset: record of primitives (null/boolean/int/long/
float/double/string/bytes), nullable unions ``["null", T]`` / ``[T,
"null"]``, and arrays of primitives — the shapes log pipelines actually
put on the wire. Nested records raise ``ValueError`` up front.
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


def _field_kind(t: Any) -> tuple[str, bool]:
    """Returns (base type or 'array:<item>', nullable)."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(t) != 2 or len(non_null) != 1:
            raise ValueError(f"only 2-branch null unions supported, got {t}")
        base, _ = _field_kind(non_null[0])
        return base, True
    if isinstance(t, dict):
        if t.get("type") == "array":
            item = t["items"]
            if not isinstance(item, str) or item not in _PRIMITIVES or item == "null":
                raise ValueError(f"array items must be primitive, got {item}")
            return f"array:{item}", False
        raise ValueError(f"unsupported complex type {t.get('type')}")
    if t not in _PRIMITIVES:
        raise ValueError(f"unsupported avro type {t!r}")
    return t, False


def _spark_type(kind: str) -> str:
    if kind.startswith("array:"):
        return f"array<{_PRIMITIVES[kind.split(':', 1)[1]]}>"
    return _PRIMITIVES[kind]


def record_fields(schema: dict) -> list[tuple[str, str, bool]]:
    """[(name, kind, nullable)] for a record schema."""
    if schema.get("type") != "record":
        raise ValueError("schema must be an avro record")
    out = []
    for f in schema["fields"]:
        kind, nullable = _field_kind(f["type"])
        out.append((f["name"], kind, nullable))
    return out


def spark_schema_of(schema: dict) -> str:
    return ", ".join(
        f"`{n}`: {_spark_type(k)}" for n, k, _ in record_fields(schema)
    )


# --- one-value encode/decode ----------------------------------------------


def _encode_value(out: bytearray, kind: str, v: Any) -> None:
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
    elif kind.startswith("array:"):
        item = kind.split(":", 1)[1]
        items = list(v)
        if items:
            _write_varint(out, len(items))  # one block
            for x in items:
                _encode_value(out, item, x)
        _write_varint(out, 0)  # end of blocks
    else:  # pragma: no cover
        raise ValueError(kind)


def _decode_value(buf: bytes, pos: int, kind: str) -> tuple[Any, int]:
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
    if kind.startswith("array:"):
        item = kind.split(":", 1)[1]
        acc = []
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                return acc, pos
            if n < 0:  # block with byte-size prefix (spec-permitted form)
                n = -n
                _, pos = _read_varint(buf, pos)
            for _ in range(n):
                x, pos = _decode_value(buf, pos, item)
                acc.append(x)
    raise ValueError(kind)  # pragma: no cover


def encode_record(schema: dict, row: dict) -> bytes:
    """One record → avro binary body (no container-file framing)."""
    out = bytearray()
    for name, kind, nullable in record_fields(schema):
        v = row.get(name)
        if nullable:
            # union index: branch order as written in the schema
            branches = schema_field_types(schema)[name]
            idx = branches.index("null") if v is None else 1 - branches.index("null")
            _write_varint(out, idx)
            if v is None:
                continue
        elif v is None:
            raise ValueError(f"field {name} is not nullable")
        _encode_value(out, kind, v)
    return bytes(out)


def decode_record(schema: dict, buf: bytes) -> dict:
    out: dict[str, Any] = {}
    pos = 0
    for name, kind, nullable in record_fields(schema):
        if nullable:
            branches = schema_field_types(schema)[name]
            idx, pos = _read_varint(buf, pos)
            if branches[idx] == "null":
                out[name] = None
                continue
        out[name], pos = _decode_value(buf, pos, kind)
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
    names = [n for n, _, _ in fields]
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
