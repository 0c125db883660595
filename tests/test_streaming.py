"""Structured Streaming operator variants, driven by a file source to a
memory sink via processAllAvailable (synchronous smoke pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.streaming import (
    stream_aggregate,
    stream_dedupe,
    stream_reduce_sessions,
    stream_throttle,
)


@pytest.fixture()
def events_path(spark, tmp_path):
    """Deterministic event stream: 100 events, 4 types, 10s apart."""
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 10).alias("event_ts"),
        F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    p = str(tmp_path / "events")
    df.repartition(2).write.parquet(p)
    return p


def _run_to_memory(spark, sdf, name, tmp_path, output_mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _read_stream(spark, path):
    schema = (
        "event_id long, event_ts timestamp, event_type string, value double"
    )
    return spark.readStream.schema(schema).parquet(path)


def test_stream_aggregate_counts(spark, events_path, tmp_path):
    sdf = stream_aggregate(
        _read_stream(spark, events_path),
        series_cols=["event_type"],
        interval_secs=100,
        mode="sum",
    )
    # append mode emits only watermark-closed windows; use update-less
    # complete-mode check instead: total events across emitted windows
    out = _run_to_memory(spark, sdf, "agg_out", tmp_path, "append")
    # windows fully below max_ts - 30s watermark are emitted
    rows = out.collect()
    assert all(r.events > 0 for r in rows)
    # 100 events over 1000s in 100s windows → 10 windows; the last may be
    # held back by the watermark
    starts = {r.window_start for r in rows}
    assert 8 <= len(starts) <= 10 * 4  # per type


def test_stream_dedupe(spark, events_path, tmp_path):
    ev = _read_stream(spark, events_path)
    sdf = stream_dedupe(ev, match=["event_type"], watermark="1 hour")
    out = _run_to_memory(spark, sdf, "dd_out", tmp_path)
    assert out.count() == 4  # one per event_type within the watermark


def test_stream_sessions(spark, tmp_path):
    # two sessions per key: gap of 1000s between event 5 and 6
    df = spark.range(10).select(
        F.timestamp_seconds(
            1704067200 + F.when(F.col("id") < 5, F.col("id") * 10)
            .otherwise(2000 + F.col("id") * 10)
        ).alias("event_ts"),
        F.lit("k1").alias("k"),
        F.lit(1.0).alias("value"),
    )
    # sentinel far in the future advances the watermark so both k1 sessions
    # close and emit in append mode
    sentinel = spark.createDataFrame(
        [("sentinel", 1.0)], "k string, value double"
    ).select(F.timestamp_seconds(F.lit(1704067200 + 100000)).alias("event_ts"), "k", "value")
    p = str(tmp_path / "sess")
    df.unionByName(sentinel).write.parquet(p)
    sdf = stream_reduce_sessions(
        spark.readStream.schema("event_ts timestamp, k string, value double").parquet(p),
        group_by=["k"],
        gap_secs=60,
        aggs={"value": "sum"},
    )
    out = _run_to_memory(spark, sdf, "sess_out", tmp_path)
    rows = sorted(
        out.filter("k = 'k1'").collect(), key=lambda r: r.session_start
    )
    assert [r.events_count for r in rows] == [5, 5]
    assert all(r.value_sum == 5.0 for r in rows)


def test_stream_throttle_state(spark, events_path, tmp_path):
    sdf = stream_throttle(
        _read_stream(spark, events_path),
        threshold=3,
        window_secs=200,
        key_field="event_type",
    )
    out = _run_to_memory(spark, sdf, "thr_out", tmp_path)
    # 100 events / 4 types / (200s windows = 5 events per type per window):
    # keep 3 of 5 per (type, window) → 5 windows × 4 types × 3 = 60
    assert out.count() == 60
    per_key = {r.key: r["count"] for r in out.groupBy("key").count().collect()}
    assert set(per_key.values()) == {15}
