"""AgentDDSketch (functions/ddsketch.py) vs an independent pure-Python
replay of the reference's mapping math (vector-core ddsketch.rs)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from vector_spark.functions import ddsketch as DD


def _ref_key(v: float) -> int:
    """Independent reimplementation of Config::key for cross-checking."""
    if v < 0:
        return -_ref_key(-v)
    if v == 0 or v < DD.NORM_MIN:
        return 0
    # round-half-even, like the Rust round_to_even helper
    x = math.log(v) / DD.GAMMA_LN
    rounded = round(x)  # Python round IS banker's rounding
    return max(1, min(DD.MAX_KEY, rounded + DD.NORM_BIAS))


def test_key_parity_with_reference_math(spark):
    vals = ([0.0, 1e-12, DD.NORM_MIN, 1e-9, 0.5, 1.0, 2.0, 10.0, 1234.5,
             1e6, 1e18, -1.0, -42.5] + [float(i) for i in range(1, 300, 7)])
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.k for r in df.select(
        DD.ddsketch_key(F.col("v")).alias("k")).collect()]
    assert got == [_ref_key(v) for v in vals]


def test_relative_error_guarantee():
    # lower_bound(key(v)) reconstructs v within the two-sided γ bound
    for v in [0.001, 0.7, 1.0, 3.14159, 99.5, 12345.678, 9.9e8]:
        k = _ref_key(v)
        lb = DD.bin_lower_bound(k)
        assert lb <= v * DD.GAMMA * (1 + 1e-12)
        assert lb >= v / (DD.GAMMA * (1 + 1e-12))


def test_agg_bins_counts_and_quantile(spark):
    rows = [(i % 3, float(v)) for i, v in enumerate(
        [1.0, 1.0, 2.0, 5.0, 5.0, 5.0, 100.0, 0.0, -3.0] * 50
    )]
    df = spark.createDataFrame(rows, "g int, v double")
    out = {r.g: r for r in DD.ddsketch_agg(df, "v", ["g"]).collect()}
    all_vals = {}
    for g, v in rows:
        all_vals.setdefault(g, []).append(v)
    for g, r in out.items():
        vals = all_vals[g]
        assert r["count"] == len(vals)  # r.count is the Row method
        assert r.min == min(vals) and r.max == max(vals)
        assert r.sum == sum(vals)
        assert abs(r.avg - sum(vals) / len(vals)) < 1e-12
        # bins: sorted keys, counts match an exact key histogram
        hist = {}
        for v in vals:
            hist[_ref_key(v)] = hist.get(_ref_key(v), 0) + 1
        assert list(r.ks) == sorted(hist)
        assert dict(zip(r.ks, r.ns)) == hist
        # median reconstructs within the sketch guarantee
        med = sorted(vals)[len(vals) // 2]
        q = DD.quantile_from_bins(list(r.ks), list(r.ns), 0.5)
        if med > 0:
            assert q <= med * DD.GAMMA and q >= med / DD.GAMMA


def test_u16_chunking(spark):
    df = spark.range(70_000).select(
        F.lit(0).alias("g"), F.lit(8.0).alias("v")
    )
    r = DD.ddsketch_agg(df, "v", ["g"]).first()
    assert r["count"] == 70_000
    assert list(r.ns) == [70_000 - 65_535, 65_535]  # same key, split bins
    assert r.ks[0] == r.ks[1] == _ref_key(8.0)
