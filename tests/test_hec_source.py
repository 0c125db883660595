"""Splunk HEC source decode (sources/splunk.py) vs src/sources/splunk_hec
semantics — time cutoffs, object events, fields, channel default."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from vector_spark.sources.splunk import parse_hec_events


def _parse(spark, objs, **kw):
    df = spark.createDataFrame(
        [(json.dumps(o),) for o in objs], "value string"
    )
    return parse_hec_events(df, **kw).collect()


def test_time_magnitude_cutoffs(spark):
    rows = _parse(spark, [
        {"event": "secs", "time": 1704174378},
        {"event": "millis", "time": 1704174378194},
        {"event": "nanos", "time": 1704174378194000000},
        {"event": "float", "time": 1704174378.5},
        {"event": "string", "time": "1704174378"},
        {"event": "none"},
    ])
    by = {r.message: r for r in rows}
    assert str(by["secs"].timestamp) == "2024-01-02 05:46:18"
    assert by["millis"].timestamp.microsecond == 194000
    assert by["nanos"].timestamp.microsecond == 194000
    assert by["float"].timestamp.microsecond == 500000
    # numeric strings parse like numbers (mod.rs:754)
    assert by["string"].timestamp == by["secs"].timestamp
    assert by["none"].timestamp is None


def test_object_event_fields_and_channel_default(spark):
    rows = _parse(
        spark,
        [
            {"event": {"a": 1, "b": "x"}, "fields": {"team": "t1"},
             "host": "web", "index": "main", "source": "s",
             "sourcetype": "st"},
            {"event": "plain", "channel": "explicit"},
        ],
        default_channel=F.lit("hdr-chan"),
    )
    obj = next(r for r in rows if r.event_is_json)
    assert json.loads(obj.message) == {"a": 1, "b": "x"}
    assert obj.fields == {"team": "t1"}
    assert (obj.host, obj.splunk_index, obj.splunk_source,
            obj.splunk_sourcetype) == ("web", "main", "s", "st")
    # header/query channel is the default; body channel wins
    assert obj.splunk_channel == "hdr-chan"
    plain = next(r for r in rows if not r.event_is_json)
    assert plain.message == "plain" and plain.splunk_channel == "explicit"
