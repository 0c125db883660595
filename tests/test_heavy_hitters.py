"""Heavy hitters + count-min sketch (operators/heavy_hitters.py).

The two-phase sampled path is driver-gated bit-exact (seq_heavy_hitters);
here we verify the detection guarantee on planted hot keys and the CMS
overestimate-within-bound property by decoding the sketch JVM-side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators import heavy_hitters as hh


@pytest.fixture(scope="module")
def skewed(spark):
    """20k rows: key 'hot-A' 10%, 'hot-B' 5%, the rest spread over ~2k
    cold keys. Hot keys are planted as index BLOCKS, not strides — a
    stride-planted key correlated with the sample residue would dodge
    the sample entirely (the documented independence requirement on
    ``sample_col``)."""
    df = spark.range(20_000).select(
        F.col("id").alias("i"),
        F.when(F.col("id") < 2_000, "hot-A")
        .when(F.col("id") < 3_000, "hot-B")
        .otherwise(F.concat(F.lit("cold-"), (F.col("id") % 2003)))
        .alias("k"),
    )
    return df.cache()


def test_planted_hot_keys_found_with_exact_counts(spark, skewed):
    out = hh.heavy_hitters(
        skewed, "k", min_share=0.01, sample_col="i", sample_mod=20
    ).collect()
    got = {r.key: (r.n_rows, r.share) for r in out}
    assert set(got) == {"hot-A", "hot-B"}
    assert got["hot-A"] == (2000, 0.1)
    assert got["hot-B"] == (1000, 0.05)


def test_counts_are_exact_not_extrapolated(spark, skewed):
    out = hh.heavy_hitters(
        skewed, "k", min_share=0.002, sample_col="i", sample_mod=10
    )
    exact = {
        r.k: r.c
        for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in out.collect():
        assert r.n_rows == exact[r.key]


def test_candidate_set_bounds_the_shuffle(spark, skewed):
    """Cold keys below the nomination threshold never reach phase 2."""
    out = hh.heavy_hitters(
        skewed, "k", min_share=0.01, sample_col="i", sample_mod=20
    )
    assert not [r for r in out.collect() if r.key.startswith("cold-")]


def test_cms_overestimates_within_bound(spark, skewed):
    eps = 0.005
    row = hh.cms_sketch(skewed, "k", eps=eps, confidence=0.99).collect()[0]
    n = 20_000
    exact = {"hot-A": 2000, "hot-B": 1000, "cold-5": None}
    est = hh.cms_estimate(spark, row.cms, list(exact))
    true_counts = {
        r.k: r.c
        for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for key in exact:
        t = true_counts.get(key, 0)
        assert est[key] >= t, "CMS must never undercount"
        assert est[key] <= t + eps * n * 2, "CMS drifted past its bound"


def test_cms_per_group_sketches(spark, skewed):
    g = skewed.withColumn("grp", (F.col("i") % 2).cast("int"))
    rows = hh.cms_sketch(g, "k", group_by=["grp"]).collect()
    assert len(rows) == 2
    # hot-A ids 0..1999 split evenly across the two parity groups
    by_grp = {r.grp: hh.cms_estimate(spark, r.cms, ["hot-A"]) for r in rows}
    for grp in (0, 1):
        assert 1000 <= by_grp[grp]["hot-A"] <= 1000 + int(0.005 * 10_000 * 2)
