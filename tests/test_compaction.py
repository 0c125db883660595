"""Small-file compaction: bin-pack rewrite of partitioned parquet sinks
(sinks/compact.py) — data-identical, file count collapses to the plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vector_spark.sinks.compact import compact, plan_compaction, _data_files


def _fingerprint(spark, path):
    df = spark.read.parquet(path)
    return (
        df.count(),
        df.select(F.xxhash64(*sorted(df.columns)).alias("h"))
        .agg(F.expr("bit_xor(h)").alias("h")).collect()[0].h,
    )


def test_compact_partitioned(spark, tmp_path):
    root = str(tmp_path / "sink")
    df = spark.range(20_000).select(
        (F.col("id") % 3).cast("string").alias("route"),
        F.col("id").alias("event_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    # a streaming sink's fragmentation: 15 tasks × 3 partitions ≈ 45 files
    df.repartition(15).write.partitionBy("route").parquet(root)
    fp_before = _fingerprint(spark, root)
    n_files_before = sum(
        len(_data_files(os.path.join(root, d)))
        for d in os.listdir(root) if d.startswith("route=")
    )
    assert n_files_before >= 30

    plans = plan_compaction(root, target_mb=128)
    assert len(plans) == 3  # one per route partition
    assert all(p.target_files == 1 for p in plans)  # tiny data → 1 file each

    stats = compact(spark, root, target_mb=128)
    assert stats["partitions"] == 3
    assert stats["files_after"] == 3 < stats["files_before"]

    # data identical, partition columns intact
    assert _fingerprint(spark, root) == fp_before
    out = spark.read.parquet(root)
    assert out.filter(F.col("route") == "1").count() > 0
    # idempotent: second run finds nothing to do
    assert plan_compaction(root, target_mb=128) == []


def test_compact_flat_dir(spark, tmp_path):
    root = str(tmp_path / "flat")
    spark.range(5_000).repartition(12).write.parquet(root)
    fp = _fingerprint(spark, root)
    stats = compact(spark, root, target_mb=64)
    assert stats["files_before"] >= 12 and stats["files_after"] == 1
    assert _fingerprint(spark, root) == fp


def test_topology_parquet_sink_compacts(spark, tmp_path):
    from vector_spark.plans.topology import compile_config

    out = str(tmp_path / "topo_sink")
    topo = compile_config(
        spark,
        {
            "sources": {"gen": {"type": "sequences", "n": 5000}},
            "sinks": {
                "store": {
                    "type": "parquet",
                    "inputs": ["gen"],
                    "path": out,
                    "compact": True,
                    "compact_target_mb": 256,
                }
            },
        },
    )
    results = topo.write_sinks()
    assert "compacted" in str(results["store"])
    files = _data_files(out)
    assert len(files) == 1  # 5k demo rows pack into one file
    assert spark.read.parquet(out).count() == 5000
