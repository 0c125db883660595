"""Keyed upsert via dynamic partition overwrite (sinks/upsert.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks.upsert import upsert_partitioned


@pytest.fixture()
def target(spark, tmp_path):
    """Base table: 300 keys over 3 day-partitions, version 1."""
    p = str(tmp_path / "tbl")
    spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("day"),
        F.lit(1).alias("version"),
        F.concat(F.lit("v1-"), F.col("id")).alias("payload"),
    ).write.partitionBy("day").parquet(p)
    return p


def _snapshot(path, day):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, f"day={day}", "*.parquet"))
    }


def test_upsert_replaces_keys_and_keeps_rest(spark, target):
    updates = spark.range(5).select(
        (F.col("id") * 3).alias("k"),          # keys 0,3,6,9,12 — all day=0
        F.lit(0).alias("day"),
        F.lit(2).alias("version"),
        F.concat(F.lit("v2-"), F.col("id") * 3).alias("payload"),
    )
    n = upsert_partitioned(spark, target, updates, "k", "version", "day")
    assert n == 1

    out = spark.read.parquet(target)
    assert out.count() == 300                   # upsert, not append
    got = {r.k: (r.version, r.payload) for r in out.filter("day = 0").collect()}
    for k in (0, 3, 6, 9, 12):
        assert got[k] == (2, f"v2-{k}")
    assert got[15] == (1, "v1-15")              # untouched key, same partition


def test_untouched_partitions_not_rewritten(spark, target):
    before_d1, before_d2 = _snapshot(target, 1), _snapshot(target, 2)
    updates = spark.createDataFrame(
        [(0, 0, 5, "vnew-0")], "k long, day long, version int, payload string"
    )
    upsert_partitioned(spark, target, updates, "k", "version", "day")
    assert _snapshot(target, 1) == before_d1, "day=1 files must be untouched"
    assert _snapshot(target, 2) == before_d2, "day=2 files must be untouched"


def test_update_wins_version_tie(spark, target):
    updates = spark.createDataFrame(
        [(30, 0, 1, "tied-update")],            # same version as current
        "k long, day long, version int, payload string",
    )
    upsert_partitioned(spark, target, updates, "k", "version", "day")
    row = spark.read.parquet(target).filter("k = 30").collect()[0]
    assert row.payload == "tied-update"


def test_stale_update_loses(spark, target):
    updates = spark.createDataFrame(
        [(60, 0, 5, "v5"), (60, 0, 3, "stale")],
        "k long, day long, version int, payload string",
    )
    upsert_partitioned(spark, target, updates, "k", "version", "day")
    row = spark.read.parquet(target).filter("k = 60").collect()[0]
    assert (row.version, row.payload) == (5, "v5")


def test_empty_updates_noop(spark, target):
    empty = spark.createDataFrame(
        [], "k long, day long, version int, payload string"
    )
    assert upsert_partitioned(spark, target, empty, "k", "version", "day") == 0
