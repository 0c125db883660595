"""New Relic / Azure Monitor / CloudWatch Logs sink encoders vs reference
src/sinks/{new_relic/model.rs, azure_monitor_logs/sink.rs,
aws_cloudwatch_logs/request_builder.rs}."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.sinks import azure as AZ
from vector_spark.sinks import cloudwatch as CW
from vector_spark.sinks import new_relic as NR


def _one(df, col="x"):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def test_new_relic_log_full_and_defaults(spark):
    df = spark.range(1)
    full = _one(df.select(NR.encode_new_relic_log(
        F.lit('say "hi"'), ts_ms=F.lit(1700000000123),
        attributes=F.create_map(
            F.lit("uid"), F.lit("42"),            # pre-encoded number
            F.lit("app"), F.lit('"web"'),         # pre-encoded string
        ),
    ).alias("x")))
    assert full == (
        '{"message":"say \\"hi\\"","timestamp":1700000000123,'
        '"attributes":{"app":"web","uid":42}}'
    )
    # no message → reference default; no timestamp → key skipped
    dflt = _one(df.select(NR.encode_new_relic_log(
        F.lit(None).cast("string"), ts_ms=F.lit(None).cast("long"),
    ).alias("x")))
    assert dflt == '{"message":"log from vector","attributes":{}}'


def test_new_relic_metric_kind_mapping(spark):
    df = spark.range(1)

    def enc(kind, mtype, iv):
        return _one(df.select(NR.encode_new_relic_metric(
            F.lit("m"), F.lit(kind), F.lit(mtype), F.lit(2.5),
            F.lit(1700000000123),
            interval_ms=F.lit(iv).cast("long"),
        ).alias("x")))

    assert enc("incremental", "counter", 10000) == (
        '{"interval.ms":10000,"name":"m","type":"count","value":2.5,'
        '"timestamp":1700000000123}'
    )
    assert enc("absolute", "counter", None) == (
        '{"name":"m","type":"gauge","value":2.5,"timestamp":1700000000123}'
    )
    assert enc("absolute", "gauge", 5) == (
        '{"name":"m","type":"gauge","value":2.5,"timestamp":1700000000123}'
    )
    # incremental counter without interval → dropped (NULL)
    assert enc("incremental", "counter", None) is None
    # NaN → dropped
    assert _one(df.select(NR.encode_new_relic_metric(
        F.lit("m"), F.lit("absolute"), F.lit("gauge"),
        F.lit(float("nan")), F.lit(0),
    ).alias("x"))) is None


def test_new_relic_bodies(spark):
    df = spark.createDataFrame([("b",), ("a",)], "o string")
    logs = _one(df.agg(NR.logs_body(
        F.sort_array(F.collect_list("o"))).alias("x")))
    assert logs == '[{"logs":[a,b]}]'
    metrics = _one(df.agg(NR.metrics_body(
        F.sort_array(F.collect_list("o"))).alias("x")))
    assert metrics == '[{"metrics":[a,b]}]'


def test_azure_time_generated_splices_sorted(spark):
    df = spark.range(1).select(
        F.create_map(
            F.lit("host"), F.lit('"h1"'),
            F.lit("Alpha"), F.lit("3"),
        ).alias("f"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05.007")).alias("ts"),
    )
    out = _one(df.select(
        AZ.encode_azure_monitor_log(F.col("f"), F.col("ts")).alias("x")
    ))
    # sorted keys: Alpha < TimeGenerated < host; millis ALWAYS 3 digits
    assert out == (
        '{"Alpha":3,"TimeGenerated":"2026-01-02T03:04:05.007Z",'
        '"host":"h1"}'
    )
    whole = _one(df.select(AZ.rfc3339_millis(
        F.to_timestamp(F.lit("2026-01-02 03:04:05"))).alias("x")))
    assert whole == "2026-01-02T03:04:05.000Z"
    body = _one(
        spark.createDataFrame([("b",), ("a",)], "o string")
        .agg(AZ.azure_body(F.sort_array(F.collect_list("o"))).alias("x"))
    )
    assert body == "[a,b]"


def test_cloudwatch_put_log_events(spark):
    rows = [
        ("g", "s1", 200, "later"),
        ("g", "s1", 100, 'first "quoted"'),
        ("g", "s2", 50, "other stream"),
    ]
    df = spark.createDataFrame(
        rows, "log_group string, log_stream string, ts_ms long, message string"
    )
    out = {
        (r.log_group, r.log_stream): (r.n_events, r.body)
        for r in CW.put_log_events_body(df).collect()
    }
    assert out[("g", "s1")] == (
        2,
        '{"logEvents":[{"timestamp":100,"message":"first \\"quoted\\""},'
        '{"timestamp":200,"message":"later"}],'
        '"logGroupName":"g","logStreamName":"s1"}',
    )
    assert out[("g", "s2")][0] == 1
