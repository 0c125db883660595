"""Behavior tests — the reference's tests/behavior/transforms/*.toml corpus
re-expressed through the topology unit-test harness (run_unit_test ≙
`vector test`, reference src/config/unit_test/mod.rs:99-156).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.plans import compile_config, run_unit_test
from vector_spark.operators import dedupe, remap, route


# --- dedupe (tests/behavior/transforms/dedupe.toml) -------------------------


def test_dedupe_match_fields(spark):
    # rows {a:1,b:2},{a:1,b:3},{a:2,b:4} with match=[a] → first and third kept
    df = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 2), (2, 4, 3)], "a long, b long, ord long"
    )
    out = dedupe(df, match=["a"], order_by=["ord"]).collect()
    assert sorted((r.a, r.b) for r in out) == [(1, 2), (2, 4)]


def test_dedupe_type_aware(spark):
    # int 1 ≠ string "1" (reference transform.rs:54-67): typed columns make
    # the distinction structural — a long column and a string column never
    # collide even when their rendered values match
    df = spark.createDataFrame([(1, "1"), (1, "1")], "a long, b string")
    assert dedupe(df, match=["a", "b"]).count() == 1
    df2 = spark.createDataFrame([("x", 1, 1), ("x", None, 2)], "k string, a long, ord long")
    # null vs value are distinct fingerprints
    assert dedupe(df2, match=["k", "a"], order_by=["ord"]).count() == 2


def test_dedupe_ignore_fields(spark):
    df = spark.createDataFrame(
        [(1, 2, "x"), (1, 3, "x"), (1, 2, "y")], "a long, b long, c string"
    )
    # ignore=[b] → fingerprint over (a,c) → {1,x} and {1,y}
    assert dedupe(df, ignore=["b"]).count() == 2


# --- route (tests/behavior/transforms/route.toml) ---------------------------


def test_route_outputs_and_unmatched(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "foo string, i long"
    )
    outs = route(df, {"has_foo": "exists(.foo)"})
    assert sorted(r.i for r in outs["has_foo"].collect()) == [1, 3]
    assert [r.i for r in outs["_unmatched"].collect()] == [2]


def test_route_copies_to_all_matching(spark):
    # an event matching two conditions appears in BOTH outputs (route.rs:42-49)
    df = spark.createDataFrame([(500, "app")], "status long, src string")
    outs = route(
        df, {"errors": ".status >= 400", "app_events": '.src == "app"'}
    )
    assert outs["errors"].count() == 1
    assert outs["app_events"].count() == 1


def test_route_reserved_names(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="reserved"):
        route(df, {"_unmatched": ".a == 1"})


# --- remap_with_drop (tests/behavior/transforms/remap_with_drop.toml) -------


def test_remap_drop_and_reroute(spark):
    df = spark.createDataFrame(
        [("123", 1), ("oops", 2)], "raw string, i long"
    )
    outs = remap(
        df,
        {"parsed": F.col("raw").try_cast("long")},
        error_when="is_null(.parsed)",
        drop_on_error=True,
        reroute_dropped=True,
        component_id="parse_raw",
    )
    ok = outs["primary"].collect()
    assert [r.i for r in ok] == [1] and ok[0].parsed == 123
    bad = outs["dropped"].collect()
    assert [r.i for r in bad] == [2]
    # original event annotated, not the partial mutation (remap.rs:482-543)
    assert "parsed" not in outs["dropped"].columns[:2] and bad[0].raw == "oops"
    ann = bad[0].metadata_dropped
    assert ann.reason == "error" and ann.component_id == "parse_raw"


def test_remap_keep_on_error(spark):
    df = spark.createDataFrame([("123",), ("oops",)], "raw string")
    outs = remap(
        df,
        {"parsed": F.col("raw").try_cast("long")},
        error_when="is_null(.parsed)",
        drop_on_error=False,
        reroute_dropped=False,
    )
    rows = outs["primary"].orderBy("raw").collect()
    assert rows[0].parsed == 123 and rows[1].parsed is None


def test_remap_abort_keep_reverts(spark):
    # remap.rs:981-1007 check_remap_abort: drop_on_abort=false → the event
    # passes through UNCHANGED (original forwarded, mutations reverted)
    df = spark.createDataFrame([("keep", 1), ("zap", 2)], "tag string, i long")
    outs = remap(
        df,
        {"tag": F.upper("tag"), "extra": F.lit("hello")},
        abort_when=F.col("tag") == "ZAP",
        drop_on_abort=False,
        reroute_dropped=False,
    )
    rows = {r.i: r for r in outs["primary"].collect()}
    assert len(rows) == 2
    assert rows[1].tag == "KEEP" and rows[1].extra == "hello"
    # aborted row reverted: overwritten col restored, new col nulled
    assert rows[2].tag == "zap" and rows[2].extra is None


def test_remap_abort_drop_and_reroute(spark):
    # remap.rs:1009-1032 check_remap_abort_drop + annotation reason="abort"
    df = spark.createDataFrame([("keep", 1), ("zap", 2)], "tag string, i long")
    outs = remap(
        df,
        {"tag": F.upper("tag")},
        abort_when=F.col("tag") == "ZAP",
        drop_on_abort=True,
        reroute_dropped=True,
        component_id="abortable",
    )
    ok = outs["primary"].collect()
    assert [(r.tag, r.i) for r in ok] == [("KEEP", 1)]
    bad = outs["dropped"].collect()
    assert [(r.tag, r.i) for r in bad] == [("zap", 2)]  # original, not ZAP
    ann = bad[0].metadata_dropped
    assert ann.reason == "abort" and ann.component_id == "abortable"


def test_remap_error_keep_reverts_overwrite(spark):
    # remap.rs:619-623: error + drop_on_error=false forwards the ORIGINAL
    # event — an overwritten column is restored, not left partially mutated
    df = spark.createDataFrame([("123",), ("oops",)], "raw string")
    outs = remap(
        df,
        {"raw": F.col("raw").try_cast("long").cast("string")},
        error_when="is_null(.raw)",
        drop_on_error=False,
        reroute_dropped=False,
    )
    vals = sorted(r.raw for r in outs["primary"].collect())
    assert vals == ["123", "oops"]


def test_remap_mixed_error_and_abort_reasons(spark):
    # one dropped output carries both reasons, abort wins when both match
    df = spark.createDataFrame(
        [("ok", 1), ("bad", 2), ("halt", 3)], "tag string, i long"
    )
    outs = remap(
        df,
        {"up": F.upper("tag")},
        error_when=F.col("tag") == "bad",
        abort_when=F.col("tag").isin("halt", "bad") & (F.col("i") == 3),
        drop_on_error=True,
        drop_on_abort=True,
        reroute_dropped=True,
    )
    assert [r.i for r in outs["primary"].collect()] == [1]
    reasons = {
        r.i: r.metadata_dropped.reason for r in outs["dropped"].collect()
    }
    assert reasons == {2: "error", 3: "abort"}


def test_remap_vrl_source_via_unit_test(spark):
    # the reference's native test shape (tests/behavior/transforms/remap.toml
    # remap_source / remap_function_upcase): a `source` VRL program compiled
    # by vector_spark.vrl, checked with a VRL output condition
    cfg = {
        "sources": {"in": {"type": "memory"}},
        "transforms": {
            "up": {
                "type": "remap",
                "inputs": ["in"],
                "source": """
                  .message = "foo"
                  .shout = upcase(string!(.raw))
                """,
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["up"]}},
    }
    df = spark.createDataFrame([("hi",), ("yo",)], "raw string")
    res = run_unit_test(
        spark,
        cfg,
        inserts={"in": df},
        extracts={"up": ['.message == "foo"', '.shout == upcase(.raw)']},
    )
    assert res["up"]["rows"] == 2 and all(res["up"]["passed"])


def test_remap_explode_array_assignment(spark):
    from vector_spark.operators.remap import remap_explode

    df = spark.createDataFrame([(1, [10, 20, 30])], "_id long, vals array<int>")
    out = remap_explode(
        df, F.transform(F.col("vals"), lambda v: F.struct(v.alias("v")))
    )
    assert [r.v for r in out.orderBy("v").collect()] == [10, 20, 30]


# --- filter (tests/behavior/transforms/filter.toml) -------------------------


def test_filter_behavior_via_topology(spark):
    config = {
        "sources": {"in": {"type": "inline", "rows": [], "schema": ""}},
        "transforms": {
            "keep_errors": {
                "type": "filter",
                "inputs": ["in"],
                "condition": '.level == "error"',
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["keep_errors"]}},
    }
    inserts = {
        "in": spark.createDataFrame(
            [("error", 1), ("info", 2), ("error", 3)], "level string, i long"
        )
    }
    res = run_unit_test(
        spark, config, inserts, {"keep_errors": ['.level == "error"']}
    )
    assert res["keep_errors"]["rows"] == 2
    assert res["keep_errors"]["passed"] == [True]


# --- reduce (tests/behavior/transforms/reduce.toml) -------------------------


def test_reduce_merge_strategies(spark):
    from vector_spark.operators import reduce_events

    df = spark.createDataFrame(
        [
            ("r1", 1, 10.0, "a", [1, 2]),
            ("r1", 2, 5.0, "b", [3]),
            ("r1", 3, 2.5, "c", [3, 4]),
            ("r2", 4, 1.0, "z", [9]),
        ],
        "request_id string, ord long, val double, msg string, arr array<int>",
    )
    out = reduce_events(
        df.withColumn("val_sum", F.col("val"))
        .withColumn("val_max", F.col("val"))
        .withColumn("val_min", F.col("val"))
        .withColumn("msgs", F.col("msg"))
        .withColumn("msg_concat", F.col("msg"))
        .withColumn("flat", F.col("arr"))
        .withColumn("shortest", F.col("arr"))
        .withColumn("longest", F.col("arr")),
        group_by=["request_id"],
        merge_strategies={
            "val_sum": "sum",
            "val_max": "max",
            "val_min": "min",
            "msgs": "array",
            "msg_concat": "concat",
            "flat": "flat_unique",
            "shortest": "shortest_array",
            "longest": "longest_array",
            "msg": "discard",
            "val": "retain",
        },
        order_by="ord",
    )
    r1 = out.filter("request_id = 'r1'").collect()[0]
    assert r1.val_sum == 17.5 and r1.val_max == 10.0 and r1.val_min == 2.5
    assert r1.msgs == ["a", "b", "c"]  # ordered by ord
    assert r1.msg_concat == "a b c"
    assert sorted(r1.flat) == [1, 2, 3, 4]
    assert r1.shortest == [3] and r1.longest in ([1, 2], [3, 4])
    assert r1.msg == "a" and r1.val == 2.5  # discard=first, retain=last
    assert r1.events_count == 3


def test_reduce_ends_when_sessionization(spark):
    from vector_spark.operators import reduce_events

    # ends_when closes the session INCLUDING the closing event
    df = spark.createDataFrame(
        [("r1", 1, False), ("r1", 2, True), ("r1", 3, False), ("r1", 4, True)],
        "request_id string, ord long, test_end boolean",
    )
    out = reduce_events(
        df,
        group_by=["request_id"],
        merge_strategies={"ord": "max"},
        order_by="ord",
        ends_when=".test_end == true",
    ).orderBy("session_id")
    rows = out.collect()
    assert [r.events_count for r in rows] == [2, 2]
    assert [r.ord for r in rows] == [2, 4]


def test_reduce_gap_sessionization(spark):
    from vector_spark.operators import reduce_events

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00"), ("u", "2024-01-01 00:00:10"),
         ("u", "2024-01-01 01:00:00")],
        "k string, ts_s string",
    ).withColumn("event_ts", F.to_timestamp("ts_s"))
    out = reduce_events(
        df,
        group_by=["k"],
        merge_strategies={},
        order_by="event_ts",
        expire_after_secs=60,
    )
    assert sorted(r.events_count for r in out.collect()) == [1, 2]


# --- topology compile errors (≙ compiler.rs validation) ---------------------


def test_topology_cycle_detection(spark):
    config = {
        "sources": {"s": {"type": "sequences", "n": 10}},
        "transforms": {
            "a": {"type": "filter", "inputs": ["b"], "condition": ".n_tok > 0"},
            "b": {"type": "filter", "inputs": ["a"], "condition": ".n_tok > 0"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["b"]}},
    }
    with pytest.raises(ValueError, match="cycle"):
        compile_config(spark, config)


def test_topology_unknown_input(spark):
    config = {
        "sources": {"s": {"type": "sequences", "n": 10}},
        "transforms": {
            "a": {"type": "filter", "inputs": ["nope"], "condition": ".x == 1"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["a"]}},
    }
    with pytest.raises(ValueError, match="does not resolve"):
        compile_config(spark, config)


def test_topology_named_ports_end_to_end(spark, tmp_path):
    config = {
        "sources": {"seq": {"type": "sequences", "n": 200}},
        "transforms": {
            "parse": {
                "type": "remap",
                "inputs": ["seq"],
                "assign": {"status": "cast(regexp_extract(message, '\" (\\\\d+) ', 1) as int)"},
            },
            "rt": {
                "type": "route",
                "inputs": ["parse"],
                "routes": {"errors": ".status >= 400", "ok": ".status < 300"},
            },
        },
        "sinks": {
            "err_sink": {"type": "memory", "inputs": ["rt.errors"]},
            "ok_parquet": {
                "type": "parquet",
                "inputs": ["rt.ok"],
                "path": str(tmp_path / "ok"),
                "partition_by": ["source"],
            },
        },
    }
    topo = compile_config(spark, config)
    results = topo.write_sinks()
    # statuses cycle 200,200,301,404,500 → errors=2/5, ok=2/5 of 200 rows
    assert results["err_sink"] == 80
    ok = spark.read.parquet(str(tmp_path / "ok"))
    assert ok.count() == 80 and "source" in ok.columns


def test_topology_multi_input_union(spark):
    config = {
        "sources": {
            "s1": {"type": "inline", "rows": [(1,)], "schema": "a long"},
            "s2": {"type": "inline", "rows": [(2,)], "schema": "a long"},
        },
        "transforms": {
            "all": {"type": "filter", "inputs": ["s1", "s2"], "condition": ".a > 0"}
        },
        "sinks": {"out": {"type": "memory", "inputs": ["all"]}},
    }
    topo = compile_config(spark, config)
    assert topo.resolve("all").count() == 2


def test_script_transform_lifecycle(spark):
    """Escape-hatch transform (≙ lua): init once per task, process per
    Arrow batch, shutdown after — counter semantics like the reference's
    lua counter example (src/transforms/lua docs)."""
    from vector_spark.operators.script import script_transform

    df = spark.range(100).toDF("id").repartition(4)

    def init():
        return {"calls": 0}

    def process(pdf, state):
        state["calls"] += 1
        out = pdf[pdf["id"] % 2 == 0].copy()
        out["doubled"] = out["id"] * 2
        return out

    out = script_transform(
        df, process, init=init, schema="id long, doubled long"
    )
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.doubled == r.id * 2 for r in rows)


def test_script_transform_in_topology(spark):
    from vector_spark.plans.topology import compile_config

    def proc(pdf, state):
        out = pdf.copy()
        out["v"] = out["v"] + 1
        return out

    cfg = {
        "sources": {
            "src": {
                "type": "inline",
                "rows": [(1, 10), (2, 20)],
                "schema": "id long, v long",
            }
        },
        "transforms": {
            "bump": {"type": "script", "inputs": ["src"], "process": proc}
        },
        "sinks": {"out": {"type": "memory", "inputs": ["bump"]}},
    }
    topo = compile_config(spark, cfg)
    got = {r.id: r.v for r in topo.resolve("bump").collect()}
    assert got == {1: 11, 2: 21}


def test_aws_ec2_metadata_stamping(spark):
    """Environment metadata stamped as literal columns (IMDS client is
    environment plumbing — metadata arrives as config; fields allowlist +
    namespace per the reference's options)."""
    import pytest as _pt

    from vector_spark.operators import aws_ec2_metadata

    df = spark.range(5)
    meta = {"instance-id": "i-0abc", "region": "us-east-1", "vpc-id": "vpc-1"}
    out = aws_ec2_metadata(df, metadata=meta, fields=["instance-id", "region"],
                           namespace="ec2")
    r = out.limit(1).collect()[0]
    assert r.ec2_instance_id == "i-0abc" and r.ec2_region == "us-east-1"
    assert "ec2_vpc_id" not in out.columns  # allowlist respected
    with _pt.raises(RuntimeError, match="IMDS"):
        aws_ec2_metadata(df)  # no metadata and no endpoint → explicit error


def test_reduce_starts_when_and_max_events(spark):
    from vector_spark.operators.reduce import reduce_events

    df = spark.createDataFrame(
        [(i, "g", 1 if i in (3, 7) else 0, i * 10) for i in range(10)],
        "i long, g string, is_start long, event_ts long",
    )
    # starts_when opens a new session AT the matching event:
    # sessions = [0,1,2], [3,4,5,6], [7,8,9]
    out = reduce_events(
        df, group_by=["g"], merge_strategies={"i": "array"},
        order_by="i", starts_when=".is_start == 1",
    )
    sessions = sorted(r.i for r in out.collect())
    assert sessions == [[0, 1, 2], [3, 4, 5, 6], [7, 8, 9]]
    # max_events additionally splits every 4 events
    out2 = reduce_events(
        df, group_by=["g"], merge_strategies={"i": "array"},
        order_by="i", max_events=4,
    )
    assert sorted(r.i for r in out2.collect()) == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    # composed: starts_when sessions then capped at 2
    out3 = reduce_events(
        df, group_by=["g"], merge_strategies={"i": "array"},
        order_by="i", starts_when=".is_start == 1", max_events=2,
    )
    assert sorted(r.i for r in out3.collect()) == [
        [0, 1], [2], [3, 4], [5, 6], [7, 8], [9]]


def test_log_to_metric_all_roundtrip(spark):
    from vector_spark.operators.log_to_metric import log_to_metric
    from vector_spark.operators.metric_to_log import (
        log_to_metric_all,
        metric_to_log,
    )

    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0), 2.5),
         (2, datetime(2024, 1, 1, 0, 0, 10), 4.0)],
        "i long, event_ts timestamp, v double",
    )
    metrics = log_to_metric(df, "gauge", "cpu", field="v")
    logs = metric_to_log(metrics)
    back = log_to_metric_all(logs)
    want = sorted((r.name, r.kind, r.event_ts, r.value) for r in metrics.collect())
    got = sorted((r.name, r.kind, r.event_ts, r.value) for r in back.collect())
    assert got == want
    # junk rows are dropped, not nulled
    junk = spark.createDataFrame([("not json",)], "message string")
    assert log_to_metric_all(junk).count() == 0


def test_graph_dot_export():
    """`vector graph` parity: DOT with the reference's default shapes and
    port-labeled edges (src/graph.rs:80-159)."""
    from vector_spark.plans import graph_dot

    config = {
        "sources": {"in": {"type": "inline", "rows": [(1,)], "schema": "a long"}},
        "transforms": {
            "rt": {
                "type": "exclusive_route",
                "inputs": ["in"],
                "routes": {"ok": ".a > 0"},
                "graph": {"node_attributes": {"color": "red"}},
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["rt.ok"]}},
    }
    dot = graph_dot(config)
    assert dot.startswith("digraph {") and dot.endswith("}")
    assert '"in" [shape="trapezium"]' in dot
    # user node_attributes merge with the default shape
    assert '"rt" [color="red" shape="diamond"]' in dot
    assert '"out" [shape="invtrapezium"]' in dot
    assert '"in" -> "rt"' in dot
    # port-qualified input becomes an edge label
    assert '"rt" -> "out" [label="ok"]' in dot


def test_tap_samples_matched_outputs(spark):
    """`vector tap` parity: glob-matched component outputs sampled as
    JSON lines, --meta envelope layout (lib/vector-tap/src/lib.rs:47-99)."""
    import json as _json

    from vector_spark.plans import compile_config, tap

    config = {
        "sources": {
            "logs": {
                "type": "inline",
                "rows": [(i, "web" if i % 2 else "db") for i in range(10)],
                "schema": "a long, source string",
            }
        },
        "transforms": {
            "rt": {
                "type": "exclusive_route",
                "inputs": ["logs"],
                "routes": {"web": '.source == "web"', "db": '.source == "db"'},
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["rt.web"]}},
    }
    topo = compile_config(spark, config)

    # glob over named ports; limit bounds rows per output
    lines = tap(topo, "rt.*", limit=3)
    assert len(lines) == 6  # two ports × 3
    assert all(_json.loads(ln)["source"] in ("web", "db") for ln in lines)

    # meta envelope: flat component fields + nested event
    (ln,) = tap(topo, "logs", limit=1, meta=True)
    ev = _json.loads(ln)
    assert ev["component_id"] == "logs"
    assert ev["component_kind"] == "source"
    assert ev["component_type"] == "inline"
    assert ev["event"]["a"] == 0

    # logfmt encoding
    (lf,) = tap(topo, "rt.db", limit=1, format="logfmt", meta=True)
    assert lf.startswith("component_id=rt.db component_kind=transform ")
    assert 'source="db"' in lf

    # no match → empty, not an error
    assert tap(topo, "nope*") == []


# --- internal metrics / `vector top` (src/top/state.rs ComponentRow) --------


def test_topology_top_flow_counters(spark):
    """observe=True attaches CollectMetrics to every component edge; after
    write_sinks the `top()` snapshot reports per-component event counts —
    `vector top` parity (src/top/state.rs:110-125) with ZERO extra jobs
    (Observation rides the sink action, it never re-executes the subtree)."""
    config = {
        "sources": {"seq": {"type": "sequences", "n": 100}},
        "transforms": {
            "keep": {
                "type": "filter",
                "inputs": ["seq"],
                "condition": ".n_tok >= 0",  # pass-through
            },
            "rt": {
                "type": "route",
                "inputs": ["keep"],
                "routes": {"big": ".n_tok >= 64", "small": ".n_tok < 64"},
            },
        },
        "sinks": {
            "big_sink": {"type": "memory", "inputs": ["rt.big"]},
            "small_sink": {"type": "memory", "inputs": ["rt.small"]},
        },
    }
    topo = compile_config(spark, config, observe=True)
    results = topo.write_sinks()
    assert results["big_sink"] + results["small_sink"] == 100
    rows = {r["component_id"]: r for r in topo.top()}
    # source + both sink edges fired; counters match the memory-sink counts
    assert rows["seq"]["sent_events_total"] == 100
    assert rows["seq"]["kind"] == "source"
    assert rows["big_sink"]["received_events_total"] == results["big_sink"]
    assert rows["small_sink"]["received_events_total"] == results["small_sink"]
    # the source edge carries a message column → byte counter present
    assert rows["seq"]["sent_bytes_total"] > 0
    # every reported row carries the `vector top` table columns
    for r in rows.values():
        assert {"component_id", "kind", "type"} <= set(r)


def test_topology_top_unfired_edges_omitted(spark):
    """A component compiled with observe=True but never consumed by an
    action must be OMITTED from top() (not block on Observation.get)."""
    config = {
        "sources": {"seq": {"type": "sequences", "n": 10}},
        "transforms": {
            "keep": {"type": "filter", "inputs": ["seq"], "condition": ".n_tok >= 0"}
        },
        "sinks": {"out": {"type": "memory", "inputs": ["keep"]}},
    }
    topo = compile_config(spark, config, observe=True)
    topo.outputs()  # resolve (attaches observations) but run NO action
    assert topo.top() == []  # nothing fired, nothing blocks
