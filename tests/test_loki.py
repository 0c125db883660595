"""Loki push-API encoder (sinks/loki.py) vs the reference LokiBatch
grouping/serialization semantics."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from vector_spark.sinks import loki


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "labels map<string,string>, line string, ts_ns long"
    )


def test_stream_key_escaping_and_sorting(spark):
    df = _df(spark, [({"b": "x,y", "a": "w\\z"}, "l", 1)])
    (r,) = df.select(loki.stream_key(F.col("labels")).alias("k")).collect()
    # sorted by key; , and \ escaped per element; trailing comma per element
    assert r.k == "a,w\\\\z,b,x\\,y,"


def test_stream_grouping_and_value_sort(spark):
    df = _df(spark, [
        ({"app": "web"}, "second", 200),
        ({"app": "web"}, "first", 100),
        ({"app": "db"}, "only", 50),
    ])
    out = {r.stream_key: r for r in loki.loki_streams(df).collect()}
    web = out["app,web,"]
    assert web.n_values == 2
    parsed = json.loads(web.stream_json)
    assert parsed["stream"] == {"app": "web"}
    assert parsed["values"] == [["100", "first", {}], ["200", "second", {}]]
    assert out["app,db,"].n_values == 1


def test_empty_labels_default_agent_vector(spark):
    df = _df(spark, [({}, "l", 1)])
    (r,) = loki.loki_streams(df).collect()
    assert r.stream_key == "agent,vector,"
    assert json.loads(r.stream_json)["stream"] == {"agent": "vector"}


def test_line_json_escaping_and_metadata(spark):
    df = spark.createDataFrame(
        [({"a": "b"}, 'say "hi"\nnow', 7, {"trace": "t1"})],
        "labels map<string,string>, line string, ts_ns long, "
        "meta map<string,string>",
    )
    (r,) = loki.loki_streams(df, metadata_col="meta").collect()
    parsed = json.loads(r.stream_json)
    assert parsed["values"] == [["7", 'say "hi"\nnow', {"trace": "t1"}]]


def test_push_body_stream_order(spark):
    df = _df(spark, [({"z": "1"}, "a", 1), ({"a": "1"}, "b", 2)])
    body = json.loads(loki.push_body(loki.loki_streams(df)))
    assert [s["stream"] for s in body["streams"]] == [{"a": "1"}, {"z": "1"}]


def test_push_bodies_distributed_assembly(spark):
    rows = [({"app": f"a{i}"}, f"line{i}", i) for i in range(40)]
    streams = loki.loki_streams(_df(spark, rows))
    bodies = loki.push_bodies(streams, buckets=4)
    out = bodies.collect()
    # every stream lands in exactly one bounded body
    assert sum(r.n_streams for r in out) == 40
    assert {r.batch_id for r in out} <= set(range(4))
    seen = []
    for r in out:
        parsed = json.loads(r.body)
        keys = [s["stream"]["app"] for s in parsed["streams"]]
        assert keys == sorted(keys)  # key-ordered inside each body
        seen += keys
    assert sorted(seen) == sorted(f"a{i}" for i in range(40))


def test_push_bodies_plan_has_no_driver_collect(spark):
    # the production assembly is a pure groupBy plan: building it must
    # not trigger any job (a driver-side collect would), and the plan
    # is aggregate/exchange only
    streams = loki.loki_streams(_df(spark, [({"a": "1"}, "l", 1)]))
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    bodies = loki.push_bodies(streams)
    after = tracker.getJobIdsForGroup(None)
    assert before == after  # lazy: no driver materialization
    plan = bodies._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" not in plan
