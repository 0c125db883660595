"""logstash lumberjack decoder (sources/logstash.py) vs reference
src/sources/logstash.rs framing."""

from __future__ import annotations

import pytest

from vector_spark.sources import logstash as LS


def test_data_frame_round_trip():
    buf = LS.encode_window(10) + LS.encode_data_frame(
        7, {"message": "hello", "host": "h1"}
    )
    frames = LS.decode_lumberjack(buf)
    assert frames == [("2", 7, '{"host":"h1","message":"hello"}')]


def test_json_frame_and_v1():
    buf = LS.encode_json_frame(3, {"b": 2, "a": [1, 2]}, version=b"1")
    assert LS.decode_lumberjack(buf) == [("1", 3, '{"a":[1,2],"b":2}')]


def test_compressed_frame_unwraps_recursively():
    inner = (LS.encode_data_frame(1, {"k": "v"})
             + LS.encode_json_frame(2, {"n": 5}))
    buf = LS.encode_window(2) + LS.encode_compressed(inner)
    assert LS.decode_lumberjack(buf) == [
        ("2", 1, '{"k":"v"}'), ("2", 2, '{"n":5}'),
    ]


def test_zero_pairs_is_invalid():
    import struct
    bad = b"2D" + struct.pack(">II", 1, 0)
    with pytest.raises(ValueError):
        LS.decode_lumberjack(bad)


def test_parse_logstash_spark(spark):
    rows = [
        (1, LS.encode_data_frame(11, {"m": "a"})),
        (2, LS.encode_compressed(LS.encode_json_frame(22, {"m": "b"}))),
        (3, b"\x00 garbage"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, payload binary")
    out = LS.parse_logstash(df).orderBy("event_id").collect()
    assert [(r.event_id, r.protocol, r.sequence_number, r.fields)
            for r in out] == [
        (1, "2", 11, '{"m":"a"}'), (2, "2", 22, '{"m":"b"}'),
    ]
