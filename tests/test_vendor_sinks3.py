"""CloudWatch PutMetricData / Honeycomb / Chronicle sink encoders vs
reference src/sinks/{aws_cloudwatch_metrics/mod.rs, honeycomb/encoder.rs,
gcp_chronicle/chronicle_unstructured.rs}."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.sinks import chronicle as CH
from vector_spark.sinks import cloudwatch as CW
from vector_spark.sinks import honeycomb as HC


def _one(df, col="x"):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def test_metric_datum_scalar(spark):
    df = spark.range(1)
    out = _one(df.select(CW.metric_datum(
        F.lit("cpu.load"), value=F.lit(2.5),
        ts_ms=F.lit(1700000000123),
        tags=F.create_map(F.lit("zone"), F.lit("b"), F.lit("host"),
                          F.lit("a1")),
    ).alias("x")))
    # dimensions sort by key regardless of map construction order
    assert out == (
        '{"MetricName":"cpu.load","Value":2.5,"Timestamp":1700000000123,'
        '"Dimensions":[{"Name":"host","Value":"a1"},'
        '{"Name":"zone","Value":"b"}]}'
    )


def test_metric_datum_distribution_and_caps(spark):
    df = spark.range(1)
    out = _one(df.select(CW.metric_datum(
        F.lit("lat"),
        values=F.array(F.lit(1.0), F.lit(2.5)),
        counts=F.array(F.lit(3.0), F.lit(1.0)),
    ).alias("x")))
    assert out == '{"MetricName":"lat","Values":[1.0,2.5],"Counts":[3.0,1.0]}'
    # >30 tags truncate to the first 30 sorted dimensions (mod.rs:210-216)
    many = F.map_from_arrays(
        F.transform(F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.format_string("k%02d", i)),
        F.transform(F.sequence(F.lit(1), F.lit(40)),
                    lambda i: i.cast("string")),
    )
    capped = _one(df.select(CW.metric_datum(
        F.lit("m"), value=F.lit(1.0), tags=many).alias("x")))
    assert capped.count('"Name"') == 30 and '"k30"' in capped \
        and '"k31"' not in capped


def test_metric_datum_arg_contract(spark):
    import pytest

    with pytest.raises(ValueError):
        CW.metric_datum(F.lit("m"))
    with pytest.raises(ValueError):
        CW.metric_datum(F.lit("m"), value=F.lit(1.0),
                        values=F.array(F.lit(1.0)))


def test_put_metric_data_body(spark):
    df = spark.createDataFrame(
        [("ns1", "a"), ("ns1", "b")], "ns string, d string")
    out = _one(
        df.groupBy("ns").agg(CW.put_metric_data_body(
            F.col("ns"), F.sort_array(F.collect_list("d"))).alias("x")))
    assert out == '{"Namespace":"ns1","MetricData":[a,b]}'


def test_honeycomb_event_nanos(spark):
    df = spark.sql(
        "select timestamp'2024-03-01 01:02:03.000456' as ts")
    out = _one(df.select(HC.encode_honeycomb_event(
        F.col("ts"), F.lit('{"k":1}')).alias("x")))
    # SecondsFormat::Nanos: always 9 fractional digits, micros + 000
    assert out == '{"time":"2024-03-01T01:02:03.000456000Z","data":{"k":1}}'
    body = _one(df.select(HC.honeycomb_body(
        F.array(F.lit("{1}"), F.lit("{2}"))).alias("x")))
    assert body == "[{1},{2}]"


def test_chronicle_entry_auto_si(spark):
    df = spark.sql(
        "select timestamp'2024-03-01 01:02:03' as s, "
        "timestamp'2024-03-01 01:02:03.120' as ms, "
        "timestamp'2024-03-01 01:02:03.000456' as us")
    r = df.select(
        CH.chronicle_entry(F.lit('a "q"'), ts=F.col("s")).alias("s"),
        CH.chronicle_entry(F.lit("b"), ts=F.col("ms")).alias("ms"),
        CH.chronicle_entry(F.lit("c"), ts=F.col("us")).alias("us"),
        CH.chronicle_entry(F.lit("d"),
                           ts=F.lit(None).cast("timestamp")).alias("n"),
    ).collect()[0]
    # AutoSi picks the smallest exact SI width (chronicle:371-396)
    assert r["s"] == ('{"log_text":"a \\"q\\"",'
                      '"ts_rfc3339":"2024-03-01T01:02:03Z"}')
    assert r["ms"] == '{"log_text":"b","ts_rfc3339":"2024-03-01T01:02:03.120Z"}'
    assert r["us"] == ('{"log_text":"c",'
                       '"ts_rfc3339":"2024-03-01T01:02:03.000456Z"}')
    assert r["n"] == '{"log_text":"d"}'  # no ts → key skipped


def test_chronicle_body_namespace_skip(spark):
    df = spark.createDataFrame(
        [("T", None, "{e1}"), ("T", "prod", "{e2}")],
        "lt string, ns string, e string")
    out = {
        (row["ns"]): row["x"]
        for row in df.groupBy("lt", "ns").agg(CH.chronicle_body(
            "c-1", F.col("lt"), F.collect_list("e"),
            namespace=F.col("ns"),
            labels_json='[{"key":"env","value":"x"}]',
        ).alias("x")).collect()
    }
    assert out[None] == ('{"customer_id":"c-1",'
                         '"labels":[{"key":"env","value":"x"}],'
                         '"log_type":"T","entries":[{e1}]}')
    assert out["prod"] == ('{"customer_id":"c-1","namespace":"prod",'
                           '"labels":[{"key":"env","value":"x"}],'
                           '"log_type":"T","entries":[{e2}]}')
