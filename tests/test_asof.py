"""As-of join vs hand-computed expectations + edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [("k1", 5, "e1"), ("k1", 10, "e2"), ("k1", 15, "e3"),
         ("k2", 7, "e4"), ("k3", 9, "e5")],
        "k string, event_ts long, ev string",
    )
    right = spark.createDataFrame(
        [("k1", 4, "v1"), ("k1", 10, "v2"), ("k1", 12, "v3"),
         ("k2", 8, "v4")],
        "k string, event_ts long, val string",
    )
    return left, right


def test_asof_latest_at_or_before(spark, sides):
    left, right = sides
    out = {r.ev: r.val for r in asof_join(left, right, on=["k"]).collect()}
    assert out == {
        "e1": "v1",   # 5 >= 4
        "e2": "v2",   # ties use <= (right at equal ts wins)
        "e3": "v3",   # 15 >= 12
        "e4": None,   # k2 right at 8 > 7
        "e5": None,   # k3 has no right rows
    }


def test_asof_preserves_left_rowcount(spark, sides):
    left, right = sides
    assert asof_join(left, right, on=["k"]).count() == left.count()


def test_asof_no_payload_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right.select("k", "event_ts"), on=["k"])


def test_asof_nullable_payload_travels_as_one_row(spark):
    left = spark.createDataFrame([("k", 10, "e")], "k string, event_ts long, ev string")
    right = spark.createDataFrame(
        [("k", 3, "a", None), ("k", 6, None, "b")],
        "k string, event_ts long, x string, y string",
    )
    r = asof_join(left, right, on=["k"]).collect()[0]
    # latest right row is (None, 'b') — x must NOT leak 'a' from the older row
    assert r.x is None and r.y == "b"


def test_asof_pandas_variant_matches_composition(spark, sides):
    from vector_spark.operators.asof import asof_join_pandas

    left, right = sides
    comp = asof_join(left, right, on=["k"]).select("ev", "val")
    pand = asof_join_pandas(left, right, on=["k"]).select("ev", "val")
    assert {tuple(r) for r in comp.collect()} == {tuple(r) for r in pand.collect()}
