"""Avro / protobuf binary codecs: golden bytes from the PUBLIC specs +
Spark round-trips.

Golden vectors come straight from the spec documents:
- Avro 1.11 spec "Binary encoding": long 1→0x02, -1→0x01, 64→0x80 0x01;
  string "foo" → 0x06 'foo'; array [3,27] → 0x04 0x06 0x36 0x00.
- protobuf encoding guide: field1(varint)=150 → 08 96 01;
  field2(string)="testing" → 12 07 "testing"; sint encoding zigzags.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark.functions import avro as A
from vector_spark.functions import proto as P


# --- avro golden bytes -----------------------------------------------------


def test_avro_varint_golden():
    out = bytearray()
    A._write_varint(out, 1)
    assert bytes(out) == b"\x02"
    out = bytearray()
    A._write_varint(out, -1)
    assert bytes(out) == b"\x01"
    out = bytearray()
    A._write_varint(out, 64)
    assert bytes(out) == b"\x80\x01"
    for n in (0, 1, -1, 63, 64, -64, -65, 2**40, -(2**40)):
        buf = bytearray()
        A._write_varint(buf, n)
        back, pos = A._read_varint(bytes(buf), 0)
        assert back == n and pos == len(buf)


def test_avro_record_golden():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    # spec's worked example: {"a": 27, "b": "foo"} → 36 06 66 6f 6f
    buf = A.encode_record(schema, {"a": 27, "b": "foo"})
    assert buf == b"\x36\x06foo"
    assert A.decode_record(schema, buf) == {"a": 27, "b": "foo"}


def test_avro_array_and_union_golden():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "opt", "type": ["null", "string"]},
        ],
    }
    # spec: array [3, 27] → 04 06 36 00 ; union null → index 0 → 00
    buf = A.encode_record(schema, {"xs": [3, 27], "opt": None})
    assert buf == b"\x04\x06\x36\x00\x00"
    assert A.decode_record(schema, buf) == {"xs": [3, 27], "opt": None}
    # union string branch → index 1 → 02, then length-prefixed body
    buf2 = A.encode_record(schema, {"xs": [], "opt": "hi"})
    assert buf2 == b"\x00\x02\x04hi"
    assert A.decode_record(schema, buf2) == {"xs": [], "opt": "hi"}


def test_avro_nested_record_map_roundtrip():
    schema = {
        "type": "record", "name": "root", "fields": [
            {"name": "id", "type": "long"},
            {"name": "sub", "type": {"type": "record", "name": "s", "fields": [
                {"name": "x", "type": "string"},
                {"name": "y", "type": ["null", "long"]},
            ]}},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
            {"name": "subs", "type": {"type": "array", "items": {
                "type": "record", "name": "t2",
                "fields": [{"name": "k", "type": "string"}]}}},
        ],
    }
    row = {"id": 7, "sub": {"x": "hi", "y": None}, "tags": {"a": "1"},
           "subs": [{"k": "z"}]}
    buf = A.encode_record(schema, row)
    # spec walk: long 7 -> 0e; record{string "hi" -> 04 6869, union null
    # (index 0) -> 00}; map 1 block {"a":"1"} -> 02 0261 0231 00;
    # array 1 block {record{string "z"}} -> 02 027a 00
    assert buf.hex() == "0e0468690002026102310002027a00"
    assert A.decode_record(schema, buf) == row


def test_avro_rejects_multibranch_union():
    bad = {
        "type": "record", "name": "t",
        "fields": [{"name": "x", "type": ["null", "long", "string"]}],
    }
    with pytest.raises(ValueError):
        A.record_fields(bad)


# --- proto golden bytes ----------------------------------------------------


def test_proto_spec_golden():
    # protobuf.dev encoding guide: Test1{a=150} → 08 96 01
    desc = {1: ("a", "int32")}
    assert P.encode_message(desc, {"a": 150}) == b"\x08\x96\x01"
    assert P.decode_message(desc, b"\x08\x96\x01") == {"a": 150}
    # Test2{b="testing"} → 12 07 74 65 73 74 69 6e 67
    desc2 = {2: ("b", "string")}
    assert P.encode_message(desc2, {"b": "testing"}) == b"\x12\x07testing"
    assert P.decode_message(desc2, b"\x12\x07testing") == {"b": "testing"}


def test_proto_zigzag_and_negatives():
    desc = {1: ("s", "sint32"), 2: ("i", "int32")}
    # zigzag: -2 → 3 (guide's table)
    assert P.encode_message(desc, {"s": -2, "i": None}) == b"\x08\x03"
    # int32 -1 → ten-byte two's-complement varint (guide: "if you use
    # int32 for a negative number, the result is always ten bytes long")
    buf = P.encode_message(desc, {"s": None, "i": -1})
    assert buf == b"\x10" + b"\xff" * 9 + b"\x01"
    assert P.decode_message(desc, buf) == {"s": None, "i": -1}


def test_proto_packed_repeated_and_unknown_fields():
    desc = {4: ("xs", "int32", "repeated")}
    # guide example: repeated field 4 = [3, 270, 86942] → 22 06 03 8E 02 9E A7 05
    buf = P.encode_message(desc, {"xs": [3, 270, 86942]})
    assert buf == bytes.fromhex("22 06 03 8E 02 9E A7 05".replace(" ", ""))
    assert P.decode_message(desc, buf) == {"xs": [3, 270, 86942]}
    # unknown field (number 9, varint) is skipped, known one still read
    extra = b"\x48\x05" + buf
    assert P.decode_message(desc, extra) == {"xs": [3, 270, 86942]}


def test_proto_fixed_and_float():
    desc = {1: ("d", "double"), 2: ("f", "float"), 3: ("x", "fixed32")}
    row = {"d": 1.5, "f": -2.0, "x": 4_000_000_000}
    buf = P.encode_message(desc, row)
    assert P.decode_message(desc, buf) == row


# --- Spark round-trips -----------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "note", "type": ["null", "string"]},
    ],
}

PROTO_DESC = {
    1: ("event_id", "int64"),
    2: ("event_type", "string"),
    3: ("value", "double"),
    4: ("tags", "int32", "repeated"),
}


def test_avro_spark_roundtrip(spark):
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
        F.when(F.col("id") % 2 == 0, F.lit("even")).alias("note"),
    )
    enc = df.select(
        "event_id",
        A.avro_encode(F.struct("event_id", "event_type", "value", "note"),
                      AVRO_SCHEMA).alias("body"),
    )
    dec = enc.select("event_id", A.avro_decode(F.col("body"), AVRO_SCHEMA).alias("r"))
    back = dec.select("event_id", "r.event_type", "r.value", "r.note")
    rows = {r.event_id: r for r in back.collect()}
    assert len(rows) == 100
    assert rows[3].event_type == "t0" and rows[3].note is None
    assert rows[4].note == "even" and rows[4].value == 6.0


def test_proto_spark_roundtrip(spark):
    df = spark.range(50).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("k"), (F.col("id") % 4).cast("string")).alias("event_type"),
        (F.col("id") / 4.0).alias("value"),
        F.array((F.col("id") % 5).cast("int"), F.lit(7)).alias("tags"),
    )
    enc = df.select(
        "event_id",
        P.proto_encode(F.struct("event_id", "event_type", "value", "tags"),
                       PROTO_DESC).alias("body"),
    )
    dec = enc.select("event_id", P.proto_decode(F.col("body"), PROTO_DESC).alias("r"))
    back = dec.select("event_id", "r.event_type", "r.value", "r.tags")
    rows = {r.event_id: r for r in back.collect()}
    assert len(rows) == 50
    assert rows[6].event_type == "k2" and rows[6].value == 1.5
    assert rows[6].tags == [1, 7]


def test_proto_nested_message_golden():
    # protobuf.dev encoding guide: Test1{a=150} -> 08 96 01 and
    # Test3{c=Test1{a=150}} (field 3 embedded) -> 1a 03 08 96 01
    t1 = {1: ("a", "int32")}
    t3 = {3: ("c", t1)}
    b = P.encode_message(t3, {"c": {"a": 150}})
    assert b.hex() == "1a03089601"
    assert P.decode_message(t3, b) == {"c": {"a": 150}}


def test_proto_repeated_nested_and_map_entry_roundtrip():
    # proto map<K,V> is repeated message {1: key, 2: value} per spec
    desc = {
        1: ("id", "int64"),
        2: ("subs", {1: ("k", "string"), 2: ("n", "int32")}, "repeated"),
        3: ("attrs", {1: ("key", "string"), 2: ("value", "string")},
            "repeated"),
    }
    row = {
        "id": 9,
        "subs": [{"k": "x", "n": 1}, {"k": "y", "n": 2}],
        "attrs": [{"key": "a", "value": "b"}],
    }
    assert P.decode_message(desc, P.encode_message(desc, row)) == row


def test_avro_nested_spark_roundtrip(spark):
    schema = {
        "type": "record", "name": "evt", "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "ctx", "type": {"type": "record", "name": "c",
                                     "fields": [
                                         {"name": "svc", "type": "string"},
                                         {"name": "attempt",
                                          "type": ["null", "long"]},
                                     ]}},
            {"name": "labels", "type": {"type": "map", "values": "string"}},
        ],
    }
    df = spark.createDataFrame(
        [(1, ("api", 2), {"z": "1"}), (2, ("web", None), {})],
        "event_id long, ctx struct<svc string, attempt bigint>, "
        "labels map<string,string>",
    )
    enc = df.select(
        "event_id",
        A.avro_encode(
            F.struct("event_id", "ctx", "labels"), schema
        ).alias("body"),
    )
    dec = enc.select(
        "event_id", A.avro_decode(F.col("body"), schema).alias("r")
    )
    rows = {r.event_id: r.r for r in dec.collect()}
    assert rows[1].ctx.svc == "api" and rows[1].ctx.attempt == 2
    assert dict(rows[1].labels) == {"z": "1"}
    assert rows[2].ctx.attempt is None and dict(rows[2].labels) == {}


def test_proto_nested_spark_roundtrip(spark):
    desc = {
        1: ("event_id", "int64"),
        2: ("ctx", {1: ("svc", "string"), 2: ("attempt", "int32")}),
        3: ("hops", {1: ("host", "string")}, "repeated"),
    }
    df = spark.createDataFrame(
        [(1, ("api", 2), [("h1",), ("h2",)]), (2, ("web", None), [])],
        "event_id long, ctx struct<svc string, attempt int>, "
        "hops array<struct<host string>>",
    )
    enc = df.select(
        "event_id",
        P.proto_encode(F.struct("event_id", "ctx", "hops"), desc)
        .alias("body"),
    )
    dec = enc.select(
        "event_id", P.proto_decode(F.col("body"), desc).alias("r")
    )
    rows = {r.event_id: r.r for r in dec.collect()}
    assert rows[1].ctx.svc == "api" and rows[1].ctx.attempt == 2
    assert [h.host for h in rows[1].hops] == ["h1", "h2"]
    assert rows[2].hops == []
