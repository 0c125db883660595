"""SketchPayload protobuf encoder (sinks/datadog_sketches.py) vs the
public dd_metric.proto wire schema."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.functions import ddsketch as DD
from vector_spark.sinks import datadog_sketches as DS


def test_payload_round_trip():
    dog = {"ts": 1_700_000_000, "cnt": 5, "min": -2.0, "max": 9.5,
           "avg": 3.1, "sum": 15.5, "k": [-1338, 0, 1338, 1431],
           "n": [1, 1, 2, 1]}
    body = DS.encode_sketch_payload([
        DS.encode_sketch("lat", "h1", ["env:prod", "app:web"], dog),
        DS.encode_sketch("rps", "", [], {**dog, "k": [], "n": []}),
    ])
    out = DS.decode_sketch_payload(body)
    assert len(out) == 2
    s0 = out[0]
    assert (s0["metric"], s0["host"], s0["tags"]) == (
        "lat", "h1", ["env:prod", "app:web"])
    d0 = s0["dogsketches"][0]
    assert (d0["ts"], d0["cnt"], d0["min"], d0["max"]) == (
        1_700_000_000, 5, -2.0, 9.5)
    assert d0["k"] == [-1338, 0, 1338, 1431]  # sint32 zigzag survives
    assert d0["n"] == [1, 1, 2, 1]
    assert out[1]["dogsketches"][0]["k"] == []


def test_bodies_from_ddsketch_agg(spark):
    rows = [(i % 2, float(v)) for i, v in enumerate([1.0, 2.0, 5.0] * 20)]
    df = spark.createDataFrame(rows, "g int, v double")
    agg = DD.ddsketch_agg(df, "v", ["g"]).select(
        (F.col("g") % 1).cast("bigint").alias("batch"),  # one batch
        F.concat(F.lit("dist_"), F.col("g").cast("string")).alias("metric"),
        F.lit("h0").alias("host"),
        F.array(F.lit("env:test")).alias("tags"),
        F.lit(1_700_000_000).alias("ts_s"),
        "ks", "ns", "count", "min", "max", "sum", "avg",
    )
    bodies = DS.sketch_payload_bodies(agg)
    assert bodies.first().n_sketches == 2
    back = {r.metric: r for r in DS.parse_sketch_payload(bodies).collect()}
    vals = {g: [v for gg, v in rows if gg == g] for g in (0, 1)}
    for g in (0, 1):
        r = back[f"dist_{g}"]
        assert r.cnt == len(vals[g])
        assert (r.min, r.max, r.sum) == (
            min(vals[g]), max(vals[g]), sum(vals[g]))
        assert r.tags == "env:test"
        ks = [int(x) for x in r.ks.split(",")]
        ns = [int(x) for x in r.ns.split(",")]
        assert sum(ns) == len(vals[g]) and ks == sorted(ks)
