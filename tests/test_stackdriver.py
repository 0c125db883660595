"""gcp_stackdriver_logs encoder (sinks/stackdriver.py) vs reference
src/sinks/gcp/stackdriver/logs/encoder.rs."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.sinks import stackdriver as SD


def test_severity_remap(spark):
    cases = [
        ("emergency", 800), ("FATAL", 800), ("alert!", 700), ("crit", 600),
        ("error", 500), ("ER", 500), ("warning", 400), ("notice", 300),
        ("informational", 200), ("debug2", 100), ("trace", 100),
        ("DEFAULT", 0), ("whatever", 0), ("550", 500), ("99", 0),
        ("200", 200),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r.x for r in df.select(SD.remap_severity(F.col("s")).alias("x"))
           .collect()]
    assert got == [v for _, v in cases]


def test_log_name_variants(spark):
    df = spark.range(1)
    for kind, want in [
        ("project", "projects/p1/logs/my-log"),
        ("folder", "folders/p1/logs/my-log"),
        ("organization", "organizations/p1/logs/my-log"),
        ("billing_account", "billingAccounts/p1/logs/my-log"),
    ]:
        got = df.select(SD.log_name(
            kind, F.lit("p1"), F.lit("my-log")).alias("x")).first().x
        assert got == want


def test_entry_and_body(spark):
    df = spark.range(1).select(
        F.lit('{"message":"hi"}').alias("payload"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05.123")).alias("ts"),
    )
    entry = df.select(SD.encode_stackdriver_entry(
        SD.log_name("project", F.lit("proj"), F.lit("app")),
        F.col("payload"),
        SD.remap_severity(F.lit("err")),
        F.lit("gce_instance"),
        F.create_map(F.lit("zone"), F.lit("us-1"),
                     F.lit("instance_id"), F.lit("42")),
        ts=F.col("ts"),
    ).alias("x")).first().x
    assert entry == (
        '{"jsonPayload":{"message":"hi"},'
        '"logName":"projects/proj/logs/app",'
        '"resource":{"labels":{"instance_id":"42","zone":"us-1"},'
        '"type":"gce_instance"},"severity":500,'
        '"timestamp":"2026-01-02T03:04:05.123Z"}'
    )
    body = spark.createDataFrame([("b",), ("a",)], "o string").agg(
        SD.entries_body(F.sort_array(F.collect_list("o"))).alias("x")
    ).first().x
    assert body == '{"entries":[a,b]}'
