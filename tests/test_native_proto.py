"""Vector native (protobuf) codec vs reference
lib/codecs/src/{decoding,encoding}/format/native.rs +
lib/vector-core/src/event/proto.rs."""

from __future__ import annotations

import json

from vector_spark.functions import native_proto as np_codec


def _rt(envelope: dict) -> dict:
    return json.loads(
        np_codec.native_to_event(np_codec.event_to_native(envelope)))


def test_log_roundtrip_nested():
    ev = {"log": {
        "message": "hello world",
        "count": 42,
        "neg": -7,
        "pi": 3.5,
        "ok": True,
        "missing": None,
        "nested": {"a": ["x", 1, {"deep": False}], "b": "y"},
    }}
    assert _rt(ev) == ev


def test_log_non_object_root_uses_dummy_fields():
    # proto.rs:292-320 — non-object root writes {".": null} + value;
    # decode prefers value and ignores the dummy
    ev = {"log": "bare string event"}
    frame = np_codec.event_to_native(ev)
    assert _rt(ev) == ev
    # the dummy fields entry is physically present in the frame
    assert b"." in frame


def test_metric_roundtrip_counter_gauge_set():
    c = {"metric": {"name": "requests_total", "namespace": "app",
                    "tags": {"env": "prod", "dc": "eu"},
                    "timestamp": "2024-05-06T07:08:09Z",
                    "kind": "incremental",
                    "counter": {"value": 12.5}}}
    assert _rt(c) == c
    g = {"metric": {"name": "temp", "kind": "absolute",
                    "gauge": {"value": -1.25}}}
    assert _rt(g) == g
    s = {"metric": {"name": "users", "kind": "incremental",
                    "set": {"values": ["a", "b", "c"]}}}
    assert _rt(s) == s


def test_metric_timestamp_auto_si():
    m = {"metric": {"name": "x", "kind": "absolute",
                    "timestamp": "2024-05-06T07:08:09.123Z",
                    "gauge": {"value": 1.0}}}
    out = _rt(m)
    assert out["metric"]["timestamp"] == "2024-05-06T07:08:09.123Z"


def test_tags_v2_copies_present():
    # proto.rs:228-247 — encode writes tags into tags_v1 AND tags_v2
    m = {"metric": {"name": "x", "kind": "absolute",
                    "tags": {"k": "v"}, "gauge": {"value": 1.0}}}
    frame = np_codec.event_to_native(m)
    # two len-delimited copies of the tag key appear on the wire
    assert frame.count(b"k") >= 2 and frame.count(b"v") >= 2


def test_spark_columns_roundtrip(spark):
    rows = [(1, json.dumps({"log": {"m": "a", "n": 1}},
                           sort_keys=True, separators=(",", ":"))),
            (2, json.dumps({"metric": {"kind": "absolute",
                                       "name": "g",
                                       "gauge": {"value": 2.0}}},
                           sort_keys=True, separators=(",", ":")))]
    df = spark.createDataFrame(rows, "rid int, envelope string")
    out = df.select(
        "rid", "envelope",
        np_codec.parse_native_proto(
            np_codec.encode_native_proto("envelope")).alias("back"),
    ).collect()
    for r in out:
        assert json.loads(r.back) == json.loads(r.envelope)
