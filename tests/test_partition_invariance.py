"""Partition-order invariance: operators whose semantics depend on an
ORDER (keep-first dedupe, counter sampling, throttling, latest-merge)
must derive that order from DATA, never from scan/partition layout.

This is the failure class the scan-spread exposed: ``aggregate_metrics``
mode=latest ordered by second-truncated ``unix_timestamp``, so sub-second
ties were resolved by arrival order and the result changed when the scan
fanned out. Each case here runs the same operator on the same rows under
three different layouts (1 partition, round-robin 7, repartition by an
unrelated column) and asserts identical results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.aggregate import aggregate_metrics
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.sample import sample
from vector_spark.operators.throttle import throttle


@pytest.fixture(scope="module")
def messy(spark):
    """Rows with sub-second timestamps and heavy key collisions."""
    return (
        spark.range(0, 3_000, 1, 5)
        .select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("key"),
            # microsecond-resolution, deliberately colliding seconds
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000)
                + (F.col("id") % 50) * 1_000_000
                + (F.col("id") * 37 % 1_000_000)
            ).alias("ts"),
            (F.col("id") % 13).cast("double").alias("value"),
            F.when(F.col("id") % 2 == 0, "incremental")
            .otherwise("absolute")
            .alias("kind"),
        )
        .cache()
    )


def _layouts(df):
    return [
        df.coalesce(1),
        df.repartition(7),
        df.repartition(6, "value"),
    ]


def _canon(df):
    return sorted(map(tuple, df.collect()))


def _assert_invariant(build):
    outs = [_canon(build(layout)) for layout in _layouts_cache]
    assert outs[0] == outs[1] == outs[2]


def test_aggregate_latest_is_layout_invariant(spark, messy):
    global _layouts_cache
    _layouts_cache = _layouts(messy)
    _assert_invariant(
        lambda df: aggregate_metrics(
            df, series_cols=["key"], value_col="value", ts_col="ts",
            interval_secs=10, mode="latest",
        )
    )


def test_aggregate_auto_is_layout_invariant(spark, messy):
    global _layouts_cache
    _layouts_cache = _layouts(messy)
    _assert_invariant(
        lambda df: aggregate_metrics(
            df, series_cols=["key"], value_col="value", ts_col="ts",
            interval_secs=10, mode="auto", kind_col="kind",
        )
    )


def test_dedupe_keep_first_is_layout_invariant(spark, messy):
    global _layouts_cache
    _layouts_cache = _layouts(messy)
    _assert_invariant(
        lambda df: dedupe(df, match=["key"], order_by=["ts", "id"])
    )


def test_throttle_is_layout_invariant(spark, messy):
    global _layouts_cache
    _layouts_cache = _layouts(messy)
    _assert_invariant(
        lambda df: throttle(
            df, threshold=3, window_secs=10, key_field="key",
            ts_col="ts", tie_breakers=["id"],
        )
    )


def test_sample_counter_is_layout_invariant(spark, messy):
    global _layouts_cache
    _layouts_cache = _layouts(messy)
    _assert_invariant(
        lambda df: sample(df, rate=5, order_by="id")
    )


def test_leakage_safe_split_is_layout_invariant(spark):
    """Component labeling + hash bucketing must not depend on scan
    layout: same docs/pairs under 1-partition, round-robin, and
    key-repartitioned layouts produce identical (split_key, split)."""
    from vector_spark.dataprep.mixing import leakage_safe_split

    docs = spark.range(0, 500, 1, 5).select(F.col("id").alias("doc_id"))
    pairs = spark.range(0, 100).select(
        (F.col("id") * 5).alias("id_a"), (F.col("id") * 5 + 1).alias("id_b")
    )
    outs = []
    for d, p in (
        (docs.coalesce(1), pairs.coalesce(1)),
        (docs.repartition(7), pairs.repartition(3)),
        (docs.repartition(11, "doc_id"), pairs.repartition(5, "id_b")),
    ):
        outs.append(
            sorted(
                (r.doc_id, r.split_key, r.split)
                for r in leakage_safe_split(
                    d, p, {"train": 0.5, "val": 0.25, "test": 0.25}
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_canonical_url_is_layout_invariant(spark):
    """Pure projection — trivially invariant, pinned anyway because a
    regression to nondeterministic param ordering would corrupt every
    crawl-dedup key downstream."""
    from vector_spark.dataprep.urls import canonical_url

    base = spark.range(0, 1_000, 1, 3).select(
        F.concat(
            F.lit("https://H"),
            (F.col("id") % 9).cast("string"),
            F.lit(".com:443/p/?b="),
            (F.col("id") % 4).cast("string"),
            F.lit("&utm_x=1&a=2#f"),
        ).alias("url")
    )
    a = sorted(
        r.c
        for r in base.coalesce(1)
        .select(canonical_url(F.col("url")).alias("c"))
        .collect()
    )
    b = sorted(
        r.c
        for r in base.repartition(13)
        .select(canonical_url(F.col("url")).alias("c"))
        .collect()
    )
    assert a == b
