"""Splunk HEC logs encoder (sinks/splunk.py) vs HecData serialization."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from vector_spark.sinks import splunk


def test_text_event_full_metadata(spark):
    df = spark.createDataFrame(
        [('say "hi"', 1704067200123, "h1", "main", "app", "st")],
        "msg string, ts long, host string, idx string, src string, st string",
    )
    (r,) = df.select(
        splunk.encode_hec_event(
            F.col("msg"),
            fields=F.create_map(F.lit("b"), F.lit("2"), F.lit("a"), F.lit("1")),
            ts_ms=F.col("ts"), host=F.col("host"), index=F.col("idx"),
            source=F.col("src"), sourcetype=F.col("st"),
        ).alias("j")
    ).collect()
    assert r.j == (
        '{"event":"say \\"hi\\"","fields":{"a":"1","b":"2"},'
        '"time":1704067200.123,"host":"h1","index":"main",'
        '"source":"app","sourcetype":"st"}'
    )
    parsed = json.loads(r.j)
    assert parsed["event"] == 'say "hi"' and parsed["time"] == 1704067200.123


def test_json_event_and_time_renderings(spark):
    df = spark.createDataFrame(
        [(1704067200000, 1704067200100)], "t0 long, t1 long"
    )
    (r,) = df.select(
        splunk.encode_hec_event(
            F.lit('{"k":1}'), event_is_json=True, ts_ms=F.col("t0")
        ).alias("a"),
        splunk.encode_hec_event(F.lit("x"), ts_ms=F.col("t1")).alias("b"),
        splunk.encode_hec_event(F.lit("x")).alias("c"),
    ).collect()
    # on-the-second → ".0" (ryu f64 form); 100ms → ".1"; no time → omitted
    assert r.a == '{"event":{"k":1},"fields":{},"time":1704067200.0}'
    assert r.b == '{"event":"x","fields":{},"time":1704067200.1}'
    assert r.c == '{"event":"x","fields":{}}'
