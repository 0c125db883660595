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

    # partial-failure resume: drop one batch marker → exactly one batch
    # re-runs and output is rewritten idempotently
    import os

    markers = sorted(
        f for f in os.listdir(job.manifest_dir) if f.endswith(".json")
    )
    os.remove(os.path.join(job.manifest_dir, markers[-1]))
    third = CheckpointedJob(
        spark, str(src), str(tmp_path / "out"), pipe, files_per_batch=1, job_id="t1"
    ).run()
    assert third["batches_run"] == 1 and third["batches_skipped"] == 3
    assert third["rows"] == first["rows"]

    # metrics surface (≙ internal_metrics)
    m = job.internal_metrics()
    assert m.count() == 8  # 4 batches × 2 sinks
    assert m.filter("rows < 0").count() == 0


def test_checkpointed_job_input_shift_reprocesses(spark, tmp_path):
    """Adding a file between runs shifts file→batch membership; batches are
    keyed by content fingerprint, so shifted batches REPROCESS instead of
    silently skipping on positional id (exactly-once claim holds under
    changing listings)."""
    import shutil

    src = tmp_path / "in"
    spark.range(60).repartition(3).write.parquet(str(src))

    def pipe(s, df):
        return {"all": df}

    job = CheckpointedJob(
        spark, str(src), str(tmp_path / "out"), pipe, files_per_batch=2, job_id="t2"
    )
    first = job.run()
    assert first["batches_run"] == 2  # 3 files → batches of 2 + 1

    # drop a new file into the listing (sorts into the middle)
    extra = tmp_path / "extra"
    spark.range(60, 70).coalesce(1).write.parquet(str(extra))
    part = next(p for p in extra.iterdir() if p.name.endswith(".parquet"))
    shutil.copy(part, src / "part-00000-aaaa-extra.parquet")

    second = CheckpointedJob(
        spark, str(src), str(tmp_path / "out"), pipe, files_per_batch=2, job_id="t2"
    ).run()
    # 4 files → 2 batches, membership changed → nothing silently skipped
    assert second["batches_skipped"] == 0
    assert second["batches_run"] == 2
    assert second["rows"]["all"] == 70


def test_lineage_columns(spark, tmp_path):
    p = tmp_path / "t"
    spark.range(10).write.parquet(str(p))
    df = with_lineage(spark.read.parquet(str(p)), "src1")
    r = df.limit(1).collect()[0]
    assert r._source_id == "src1" and "parquet" in r._source_file


def test_framing_codecs(spark, tmp_path):
    """character_delimited / length_delimited / octet_counting framers
    (lib/codecs framing enum) reconstruct the same 3 messages."""
    import struct

    from vector_spark.sources import framing as fr

    msgs = [b"alpha", b"beta with\nnewline", b"<34>1 gamma"]

    cd = tmp_path / "cd.txt"
    cd.write_bytes(b"\x1e".join(m.replace(b"\n", b" ") for m in msgs))
    got = [r.value for r in fr.frame_character_delimited(
        spark, str(cd), "\x1e").collect()]
    assert got == [m.replace(b"\n", b" ").decode() for m in msgs]

    ld = tmp_path / "ld.bin"
    ld.write_bytes(b"".join(struct.pack(">I", len(m)) + m for m in msgs))
    rows = sorted(
        fr.frame_length_delimited(spark, str(ld)).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [bytes(r.value) for r in rows] == msgs

    oc = tmp_path / "oc.bin"
    oc.write_bytes(b"".join(f"{len(m)} ".encode() + m for m in msgs))
    rows = sorted(
        fr.frame_octet_counting(spark, str(oc)).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [bytes(r.value) for r in rows] == msgs
    # newline INSIDE a frame survives octet counting (the point of RFC 6587)
    assert b"\n" in bytes(rows[1].value)


def test_exec_source_stdout_and_stderr(spark):
    from vector_spark.sources.exec import read_exec

    df = read_exec(
        spark,
        ["sh", "-c", 'echo \'{"a": 1}\'; echo oops >&2'],
        decoder="json",
    )
    rows = {r.data_stream: r for r in df.collect()}
    assert set(rows) == {"stdout", "stderr"}
    assert rows["stdout"].decoded["a"] == "1"
    assert rows["stdout"].command.startswith("sh -c")
    assert rows["stdout"].pid > 0 and rows["stdout"].host


def test_exec_source_nonzero_exit_raises(spark):
    import pytest as _pytest

    from vector_spark.sources.exec import read_exec

    with _pytest.raises(RuntimeError, match="exited 3"):
        read_exec(spark, ["sh", "-c", "echo boom >&2; exit 3"])
