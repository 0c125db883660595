"""Storage bucketing (sinks/bucketing.py): the shuffle-elimination
contract, machine-checked against the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks import bucketing as bk


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    """Two catalog tables bucketed on the same key/count."""
    seq = spark.range(20_000).select(
        (F.col("id") % 997).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(997).select(
        F.col("id").alias("k"),
        F.concat(F.lit("t-"), F.col("id")).alias("team"),
    )
    bk.write_bucketed(seq, "bt_seq", "k", n_buckets=4)
    bk.write_bucketed(dim, "bt_dim", "k", n_buckets=4)
    yield "bt_seq", "bt_dim"
    spark.sql("DROP TABLE IF EXISTS bt_seq")
    spark.sql("DROP TABLE IF EXISTS bt_dim")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    j = bk.bucketed_join(spark, ta, tb, "k")
    assert bk.n_shuffle_exchanges(j) == 0, (
        "bucketed co-located join must not shuffle either side"
    )
    # control: break one side's bucket distribution (project through an
    # expression on the key — one Catalyst won't fold away) and the same
    # merge join must shuffle again
    a = spark.table(ta).withColumn("k", F.abs(F.col("k"))).hint("merge")
    ctl = a.join(spark.table(tb).hint("merge"), "k")
    assert bk.n_shuffle_exchanges(ctl) >= 1


def test_bucketed_join_rows_match_plain_join(spark, bucketed_pair):
    ta, tb = bucketed_pair
    j = bk.bucketed_join(spark, ta, tb, "k").groupBy("team").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    p = (
        spark.table(ta)
        .join(spark.table(tb), "k")
        .groupBy("team")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, p.collect()))


def test_bucketed_aggregate_on_key_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = spark.table(ta).groupBy("k").agg(F.sum("v").alias("sv"))
    assert bk.n_shuffle_exchanges(agg) == 0, (
        "groupBy on the bucket key must reuse the write-time distribution"
    )


def test_bucket_files_bounded(spark, bucketed_pair):
    """repartition-before-write keeps files per bucket bounded (no
    task_count x n_buckets small-file explosion)."""
    ta, _ = bucketed_pair
    files = spark.table(ta).inputFiles()
    assert len(files) <= 8  # 4 buckets, at most ~1-2 files each
