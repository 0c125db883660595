"""Vector native_json codec (functions/native_json.py) vs the reference's
serde layout (lib/codecs/src/{decoding,encoding}/format/native_json.rs,
fixture corpus lib/codecs/tests/data/native_encoding/json/)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.functions import native_json as NJ


def _one(df, col="x"):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def test_encode_counter_full_envelope(spark):
    df = spark.range(1).select(
        F.lit("requests_total").alias("n"),
        F.lit("incremental").alias("k"),
        F.lit("counter").alias("t"),
        F.lit(7.0).alias("v"),
        F.lit("web").alias("ns"),
        F.create_map(F.lit("zone"), F.lit("us"), F.lit("app"), F.lit('a"b'))
        .alias("tg"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05.123")).alias("ts"),
        F.lit(10_000).alias("iv"),
    )
    out = _one(
        df.select(
            NJ.encode_native_metric(
                F.col("n"), F.col("k"), F.col("t"), value=F.col("v"),
                namespace=F.col("ns"), tags=F.col("tg"), ts=F.col("ts"),
                interval_ms=F.col("iv"),
            ).alias("x")
        )
    )
    # Field order + sorted tags + AutoSi millis + escaped quote, exactly as
    # the reference fixture corpus lays a counter out.
    assert out == (
        '{"metric":{"name":"requests_total","namespace":"web",'
        '"tags":{"app":"a\\"b","zone":"us"},'
        '"timestamp":"2026-01-02T03:04:05.123Z","interval_ms":10000,'
        '"kind":"incremental","counter":{"value":7.0}}}'
    )


def test_encode_skips_absent_options(spark):
    df = spark.range(1).select(
        F.lit("g").alias("n"), F.lit("absolute").alias("k"),
        F.lit("gauge").alias("t"), F.lit(-3.5).alias("v"),
        F.lit("").alias("ns"),
    )
    out = _one(
        df.select(
            NJ.encode_native_metric(
                F.col("n"), F.col("k"), F.col("t"), value=F.col("v"),
                namespace=F.col("ns"),
                tags=F.lit(None).cast("map<string,string>"),
                ts=F.lit(None).cast("timestamp"),
            ).alias("x")
        )
    )
    assert out == '{"metric":{"name":"g","kind":"absolute","gauge":{"value":-3.5}}}'


def test_encode_set_sorted_and_histogram_summary(spark):
    df = spark.range(1).select(
        F.lit("s").alias("n"), F.lit("absolute").alias("k"),
        F.array(F.lit("b"), F.lit("a"), F.lit("b")).alias("sv"),
        F.array(F.lit(0.5), F.lit(1.0)).alias("lims"),
        F.array(F.lit(3), F.lit(7)).alias("cnts"),
        F.array(F.lit(0.5), F.lit(0.99)).alias("qs"),
        F.array(F.lit(12.0), F.lit(99.25)).alias("qvs"),
    )
    st = _one(df.select(NJ.encode_native_metric(
        F.col("n"), F.col("k"), F.lit("set"), set_values=F.col("sv")
    ).alias("x")))
    assert st == '{"metric":{"name":"s","kind":"absolute","set":{"values":["a","b"]}}}'

    hist = _one(df.select(NJ.encode_native_metric(
        F.col("n"), F.lit("incremental"), F.lit("histogram"),
        hist_limits=F.col("lims"), hist_counts=F.col("cnts"),
        agg_count=F.lit(10), agg_sum=F.lit(12.25),
    ).alias("x")))
    assert hist == (
        '{"metric":{"name":"s","kind":"incremental","histogram":{"buckets":'
        '[{"upper_limit":0.5,"count":3},{"upper_limit":1.0,"count":7}],'
        '"count":10,"sum":12.25}}}'
    )

    summ = _one(df.select(NJ.encode_native_metric(
        F.col("n"), F.lit("incremental"), F.lit("summary"),
        quantiles=F.col("qs"), quantile_values=F.col("qvs"),
        agg_count=F.lit(4), agg_sum=F.lit(111.25),
    ).alias("x")))
    assert summ == (
        '{"metric":{"name":"s","kind":"incremental","summary":{"quantiles":'
        '[{"quantile":0.5,"value":12.0},{"quantile":0.99,"value":99.25}],'
        '"count":4,"sum":111.25}}}'
    )


def test_auto_si_timestamp_digit_tiers(spark):
    df = spark.createDataFrame(
        [("2026-01-02 03:04:05",), ("2026-01-02 03:04:05.123",),
         ("2026-01-02 03:04:05.123456",)],
        "t string",
    ).select(NJ.auto_si_timestamp(F.to_timestamp(F.col("t"))).alias("x"))
    assert [r.x for r in df.collect()] == [
        "2026-01-02T03:04:05Z",
        "2026-01-02T03:04:05.123Z",
        "2026-01-02T03:04:05.123456Z",
    ]


def test_json_f64_renderings(spark):
    df = spark.createDataFrame(
        [(0.0,), (7.0,), (-3.5,), (12.25,), (0.001,), (-2.0,)], "v double"
    ).select(NJ.json_f64(F.col("v")).alias("x"))
    assert [r.x for r in df.collect()] == [
        "0.0", "7.0", "-3.5", "12.25", "0.001", "-2.0",
    ]


def test_decode_log_and_metric_round_trip(spark):
    lines = spark.createDataFrame(
        [
            ('{"log":{"a":1,"msg":"hi \\"x\\""}}',),
            ('{"metric":{"name":"m","namespace":"ns",'
             '"tags":{"k":"v"},"timestamp":"2026-02-03T04:05:06.007Z",'
             '"interval_ms":250,"kind":"absolute","gauge":{"value":2.5}}}',),
            ('{"metric":{"name":"s","kind":"absolute",'
             '"set":{"values":["a","b"]}}}',),
            ("not json at all",),
        ],
        "value string",
    )
    out = NJ.parse_native_json(lines).collect()
    assert [r.event_kind for r in out] == ["log", "metric", "metric", None]
    assert out[0].log == '{"a":1,"msg":"hi \\"x\\""}'
    m = out[1]
    assert (m.metric_name, m.namespace, m.kind, m.metric_type) == (
        "m", "ns", "absolute", "gauge"
    )
    assert m.metric_value == 2.5
    assert m.interval_ms == 250
    assert m.tags == {"k": "v"}
    assert str(m.event_ts) == "2026-02-03 04:05:06.007000"
    assert out[2].set_values == ["a", "b"]


def test_encode_decode_is_identity_on_metric_frame(spark):
    df = spark.range(50).select(
        F.concat(F.lit("m"), (F.col("id") % 5).cast("string")).alias("n"),
        F.when(F.col("id") % 2 == 0, F.lit("incremental"))
        .otherwise(F.lit("absolute")).alias("k"),
        F.lit("counter").alias("t"),
        (F.col("id") * 0.25).alias("v"),
        F.create_map(F.lit("i"), (F.col("id") % 3).cast("string")).alias("tg"),
        F.timestamp_millis(F.lit(1_700_000_000_000) + F.col("id") * 37)
        .alias("ts"),
    )
    enc = df.select(NJ.encode_native_metric(
        F.col("n"), F.col("k"), F.col("t"), value=F.col("v"),
        tags=F.col("tg"), ts=F.col("ts"),
    ).alias("value"))
    dec = NJ.parse_native_json(enc)
    got = [
        (r.metric_name, r.kind, r.metric_type, r.metric_value,
         r.tags, r.event_ts)
        for r in dec.collect()
    ]
    want = [
        (r.n, r.k, r.t, r.v, r.tg, r.ts) for r in df.collect()
    ]
    assert got == want
