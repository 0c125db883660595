"""Sources (readers, codecs, lineage, demo generators), sinks (partitioned
writes), and checkpointed resume."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from vector_spark.sinks.manifest import CheckpointedJob
from vector_spark.sinks.writers import write_routes
from vector_spark.sources.readers import (
    demo_apache_lines,
    demo_syslog_lines,
    read_lines,
    with_lineage,
)


def test_demo_apache_lines_parse_roundtrip(spark):
    lines = demo_apache_lines(spark, 100)
    from vector_spark.functions.parse import parse_common_log_fast

    parsed = lines.select(parse_common_log_fast(F.col("value")).alias("p"))
    ok = parsed.filter(F.col("p.status").isNotNull())
    assert ok.count() == 100
    statuses = {r["p"]["status"] for r in parsed.collect()}
    assert statuses == {200, 301, 404, 500}


def test_demo_syslog_lines_parse_roundtrip(spark):
    from vector_spark.functions.parse import parse_syslog

    lines = demo_syslog_lines(spark, 50)
    parsed = lines.select(parse_syslog(F.col("value")).alias("p"))
    rows = parsed.collect()
    assert all(r["p"]["severity"] is not None for r in rows)
    assert all(r["p"]["hostname"].startswith("host-") for r in rows)
    assert {r["p"]["facility"] for r in rows} == {1}  # user facility


def test_read_lines_decoder_and_lineage(spark, tmp_path):
    f = tmp_path / "logs.txt"
    f.write_text("a=1 b=x\na=2 b=y\n")
    df = read_lines(spark, str(f), decoder="logfmt", source_id="filesrc")
    rows = df.collect()
    assert rows[0].decoded["a"] in ("1", "2")
    assert rows[0]._source_id == "filesrc"
    assert rows[0]._source_file.endswith("logs.txt")
    assert "_ingest_ts" in df.columns and "_partition_id" in df.columns


def test_write_routes_single_pass_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("errors", 1), ("ok", 2), ("ok", 3)], "route string, i long"
    )
    write_routes(df, str(tmp_path / "out"))
    back_err = spark.read.parquet(str(tmp_path / "out")).filter("route='errors'")
    assert back_err.count() == 1
    # hive layout: route=<name> subdirs exist
    assert (tmp_path / "out" / "route=ok").exists()


def test_checkpointed_job_resume(spark, tmp_path):
    # input: 4 parquet files
    src = tmp_path / "in"
    spark.range(100).withColumn("v", F.col("id") * 2).repartition(4).write.parquet(str(src))

    calls = {"n": 0}

    def pipe(s, df):
        calls["n"] += 1
        return {
            "evens": df.filter(F.col("id") % 2 == 0),
            "odds": df.filter(F.col("id") % 2 == 1),
        }

    job = CheckpointedJob(
        spark, str(src), str(tmp_path / "out"), pipe, files_per_batch=1, job_id="t1"
    )
    first = job.run()
    assert first["batches_run"] == 4 and first["batches_skipped"] == 0
    assert first["rows"]["evens"] + first["rows"]["odds"] == 100

    # simulate restart: all batches skip, totals identical
    job2 = CheckpointedJob(
        spark, str(src), str(tmp_path / "out"), pipe, files_per_batch=1, job_id="t1"
    )
    second = job2.run()
    assert second["batches_run"] == 0 and second["batches_skipped"] == 4
    assert second["rows"] == first["rows"]

    # partial-failure resume: drop the last manifest record → exactly one
    # batch re-runs and output is rewritten idempotently
    mp = job.manifest_path
    lines = open(mp).read().strip().split("\n")
    with open(mp, "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")
    third = CheckpointedJob(
        spark, str(src), str(tmp_path / "out"), pipe, files_per_batch=1, job_id="t1"
    ).run()
    assert third["batches_run"] == 1 and third["batches_skipped"] == 3
    assert third["rows"] == first["rows"]

    # metrics surface (≙ internal_metrics)
    m = job.internal_metrics()
    assert m.count() == 8  # 4 batches × 2 sinks
    assert m.filter("rows < 0").count() == 0


def test_lineage_columns(spark, tmp_path):
    p = tmp_path / "t"
    spark.range(10).write.parquet(str(p))
    df = with_lineage(spark.read.parquet(str(p)), "src1")
    r = df.limit(1).collect()[0]
    assert r._source_id == "src1" and "parquet" in r._source_file
