"""Elasticsearch bulk encoder (sinks/elasticsearch.py) vs the reference
write_bulk_action / encode_input layouts."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.sinks import elasticsearch as es


def test_action_line_variants(spark):
    df = spark.createDataFrame(
        [("logs-2026.08.18", "7", 42)], "idx string, id string, ver long"
    )
    got = df.select(
        es.bulk_action_line("index", F.col("idx"), F.col("id")).alias("a"),
        es.bulk_action_line(
            "create", F.col("idx"), suppress_type=False
        ).alias("b"),
        es.bulk_action_line(
            "update", F.col("idx"), F.col("id"), version=F.col("ver"),
        ).alias("c"),
    ).collect()[0]
    assert got.a == '{"index":{"_index":"logs-2026.08.18","_id":"7"}}'
    assert got.b == '{"create":{"_index":"logs-2026.08.18","_type":"_doc"}}'
    assert got.c == (
        '{"update":{"_index":"logs-2026.08.18","_id":"7",'
        '"version_type":"external","version":42}}'
    )


def test_bulk_block_newlines_and_datestamp(spark):
    df = spark.createDataFrame(
        [("2026-08-18 10:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    idx = es.datestamped_index("logs", F.col("ts"))
    block = es.encode_bulk(
        es.bulk_action_line("index", idx), F.lit('{"a":1}')
    )
    assert df.select(block.alias("b")).collect()[0].b == (
        '{"index":{"_index":"logs-2026.08.18"}}\n{"a":1}\n'
    )
