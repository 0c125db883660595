"""datadog_metrics series encoder (sinks/datadog_metrics.py) vs reference
src/sinks/datadog/metrics/encoder.rs + src/common/datadog.rs."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.sinks import datadog_metrics as DM


def _one(df, col="x"):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def _base(spark):
    return spark.range(1).select(
        F.to_timestamp(F.lit("2023-11-14 22:13:20")).alias("ts"),
        F.create_map(
            F.lit("zone"), F.lit("us"),
            F.lit("host"), F.lit("h1"),
            F.lit("app"), F.lit("web"),
        ).alias("tags"),
    )


def test_rate_count_gauge_set(spark):
    df = _base(spark)

    def enc(kind, mtype, iv=None, card=None, ns=None):
        return _one(df.select(DM.encode_datadog_series(
            F.lit("req"), F.lit(kind), F.lit(mtype), F.lit(15.0),
            F.col("ts"), F.col("tags"),
            namespace=F.lit(ns) if ns else None,
            interval_ms=F.lit(iv).cast("long") if iv else None,
            set_cardinality=F.lit(card) if card else None,
        ).alias("x")))

    # incremental counter + interval → rate, value ÷ interval-seconds
    assert enc("incremental", "counter", iv=10_000) == (
        '{"metric":"req","type":"rate","interval":10,'
        '"points":[[1700000000,1.5]],"tags":["app:web","zone:us"],'
        '"host":"h1"}'
    )
    # counter without interval → count; namespace dotted in
    assert enc("absolute", "counter", ns="app") == (
        '{"metric":"app.req","type":"count","interval":null,'
        '"points":[[1700000000,15.0]],"tags":["app:web","zone:us"],'
        '"host":"h1"}'
    )
    assert '"type":"gauge"' in enc("absolute", "gauge")
    # set → gauge of the cardinality
    assert '"points":[[1700000000,7.0]]' in enc("absolute", "set", card=7)
    # histogram can't ride the series payload
    assert enc("incremental", "histogram") is None


def test_special_tags_and_body(spark):
    df = spark.range(1).select(
        F.to_timestamp(F.lit("2023-11-14 22:13:20")).alias("ts"),
        F.create_map(
            F.lit("source_type_name"), F.lit("vector"),
            F.lit("device"), F.lit("sda"),
        ).alias("tags"),
    )
    out = _one(df.select(DM.encode_datadog_series(
        F.lit("m"), F.lit("absolute"), F.lit("gauge"), F.lit(1.0),
        F.col("ts"), F.col("tags"),
    ).alias("x")))
    # specials leave the tag list; host defaults to ""; skip-if-none
    # fields appear in struct order after host
    assert out == (
        '{"metric":"m","type":"gauge","interval":null,'
        '"points":[[1700000000,1.0]],"tags":[],"host":"",'
        '"source_type_name":"vector","device":"sda"}'
    )
    body = _one(
        spark.createDataFrame([("b",), ("a",)], "o string")
        .agg(DM.series_body(F.sort_array(F.collect_list("o"))).alias("x"))
    )
    assert body == '{"series":[a,b]}'
