"""Object manipulation: flatten/unflatten round-trip, merge, explode_map,
histogram buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.functions.objects import (
    explode_map,
    flatten_struct,
    histogram_buckets,
    merge_maps,
    unflatten,
)


def test_flatten_unflatten_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, ("x", (2.5, True)))],
        "id long, a struct<name string, inner struct<v double, flag boolean>>",
    )
    flat = flatten_struct(df)
    assert set(flat.columns) == {"id", "a.name", "a.inner.v", "a.inner.flag"}
    r = flat.collect()[0]
    assert r["a.inner.v"] == 2.5
    back = unflatten(flat)
    assert back.schema["a"].dataType.simpleString() == df.schema["a"].dataType.simpleString()
    assert back.collect()[0].a.inner.flag is True


def test_merge_maps_right_biased(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"}, {"b": "9", "c": "3"})],
        "m1 map<string,string>, m2 map<string,string>",
    )
    r = df.select(merge_maps(F.col("m1"), F.col("m2")).alias("m")).collect()[0].m
    assert r == {"a": "1", "b": "9", "c": "3"}


def test_explode_map(spark):
    df = spark.createDataFrame([(1, {"x": "1", "y": "2"})], "id long, m map<string,string>")
    rows = explode_map(df, "m").orderBy("key").collect()
    assert [(r.key, r.value) for r in rows] == [("x", "1"), ("y", "2")]


def test_histogram_buckets_with_clamping(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 1.0, 2.5, 9.9, 15.0]], "v double"
    )
    out = {r.bucket: r.n for r in histogram_buckets(df, "v", 0.0, 10.0, 5).collect()}
    # buckets of width 2: -5→clamp 0, 0→0, 1→0, 2.5→1, 9.9→4, 15→clamp 4
    assert out == {0: 3, 1: 1, 4: 2}


def test_let_binding_equals_inline(spark):
    from vector_spark.functions.objects import let

    df = spark.createDataFrame([("a b c a",), ("x",)], "t string")
    bound = df.select(
        let(
            F.split(F.col("t"), " "),
            lambda ws: F.size(ws) + F.size(F.array_distinct(ws)),
        ).alias("v")
    ).collect()
    inline = df.select(
        (
            F.size(F.split(F.col("t"), " "))
            + F.size(F.array_distinct(F.split(F.col("t"), " ")))
        ).alias("v")
    ).collect()
    assert [r.v for r in bound] == [r.v for r in inline] == [7, 2]


def test_let_survives_filter_pushdown(spark):
    from vector_spark.functions.objects import let

    df = spark.createDataFrame([(i, "w " * (i + 1)) for i in range(10)], "id long, t string")
    out = df.filter(
        let(F.split(F.trim(F.col("t")), " "), lambda ws: F.size(ws) >= 5)
    )
    assert out.count() == 6
    # the binding stays a single transform over a one-element array
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split") <= 2  # bound once (+1 for the array wrap at most)
