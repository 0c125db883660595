"""Structured Streaming operator variants, driven by a file source to a
memory sink via processAllAvailable (synchronous smoke pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.streaming import (
    stream_aggregate,
    stream_dedupe,
    stream_reduce_sessions,
    stream_throttle,
)


@pytest.fixture()
def events_path(spark, tmp_path):
    """Deterministic event stream: 100 events, 4 types, 10s apart."""
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 10).alias("event_ts"),
        F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    p = str(tmp_path / "events")
    df.repartition(2).write.parquet(p)
    return p


def _run_to_memory(spark, sdf, name, tmp_path, output_mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _read_stream(spark, path):
    schema = (
        "event_id long, event_ts timestamp, event_type string, value double"
    )
    return spark.readStream.schema(schema).parquet(path)


def test_stream_aggregate_counts(spark, events_path, tmp_path):
    sdf = stream_aggregate(
        _read_stream(spark, events_path),
        series_cols=["event_type"],
        interval_secs=100,
        mode="sum",
    )
    # append mode emits only watermark-closed windows; use update-less
    # complete-mode check instead: total events across emitted windows
    out = _run_to_memory(spark, sdf, "agg_out", tmp_path, "append")
    # windows fully below max_ts - 30s watermark are emitted
    rows = out.collect()
    assert all(r.events > 0 for r in rows)
    # 100 events over 1000s in 100s windows → 10 windows; the last may be
    # held back by the watermark
    starts = {r.window_start for r in rows}
    assert 8 <= len(starts) <= 10 * 4  # per type


def test_stream_dedupe(spark, events_path, tmp_path):
    ev = _read_stream(spark, events_path)
    sdf = stream_dedupe(ev, match=["event_type"], watermark="1 hour")
    out = _run_to_memory(spark, sdf, "dd_out", tmp_path)
    assert out.count() == 4  # one per event_type within the watermark


def test_stream_sessions(spark, tmp_path):
    # two sessions per key: gap of 1000s between event 5 and 6
    df = spark.range(10).select(
        F.timestamp_seconds(
            1704067200 + F.when(F.col("id") < 5, F.col("id") * 10)
            .otherwise(2000 + F.col("id") * 10)
        ).alias("event_ts"),
        F.lit("k1").alias("k"),
        F.lit(1.0).alias("value"),
    )
    # sentinel far in the future advances the watermark so both k1 sessions
    # close and emit in append mode
    sentinel = spark.createDataFrame(
        [("sentinel", 1.0)], "k string, value double"
    ).select(F.timestamp_seconds(F.lit(1704067200 + 100000)).alias("event_ts"), "k", "value")
    p = str(tmp_path / "sess")
    df.unionByName(sentinel).write.parquet(p)
    sdf = stream_reduce_sessions(
        spark.readStream.schema("event_ts timestamp, k string, value double").parquet(p),
        group_by=["k"],
        gap_secs=60,
        aggs={"value": "sum"},
    )
    out = _run_to_memory(spark, sdf, "sess_out", tmp_path)
    rows = sorted(
        out.filter("k = 'k1'").collect(), key=lambda r: r.session_start
    )
    assert [r.events_count for r in rows] == [5, 5]
    assert all(r.value_sum == 5.0 for r in rows)


def test_stream_throttle_state(spark, events_path, tmp_path):
    sdf = stream_throttle(
        _read_stream(spark, events_path),
        threshold=3,
        window_secs=200,
        key_field="event_type",
    )
    out = _run_to_memory(spark, sdf, "thr_out", tmp_path)
    # 100 events / 4 types / (200s windows = 5 events per type per window):
    # keep 3 of 5 per (type, window) → 5 windows × 4 types × 3 = 60
    assert out.count() == 60
    per_key = {
        r.event_type: r["count"]
        for r in out.groupBy("event_type").count().collect()
    }
    assert set(per_key.values()) == {15}


def test_stream_throttle_monotonic_late_events(spark, tmp_path):
    """A late event from an older window must NOT rewind the state clock:
    it clamps into the current window (consuming current quota) instead of
    resetting the count and re-admitting past-threshold events (the
    reference GCRA clock is monotonic and cannot regress)."""
    import time as _t

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id long, event_ts timestamp, event_type string, value double"

    def write_file(rows):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        df.write.mode("append").parquet(str(src))
        _t.sleep(1.1)  # distinct mod-times → deterministic batch order

    from datetime import datetime, timezone

    ts = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    # batch 1: five events in window [600, 1200) — threshold 3 keeps 3
    write_file([(i, ts(1000 + i * 10), "k", 0.0) for i in range(5)])
    # batch 2: one LATE event (window [0,600)) then two more in [600,1200)
    write_file([(10, ts(500), "k", 0.0), (11, ts(1150), "k", 0.0),
                (12, ts(1151), "k", 0.0)])

    sdf = stream_throttle(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src)),
        threshold=3,
        window_secs=600,
        key_field="event_type",
    )
    out = _run_to_memory(spark, sdf, "thr_late", tmp_path)
    # batch 1 admits exactly 3; batch 2's late + current events all find the
    # window quota exhausted → nothing more passes
    assert out.count() == 3
    kept_ts = sorted(r.event_ts.timestamp() for r in out.collect())
    assert kept_ts == [1000.0, 1010.0, 1020.0]


def test_stream_throttle_state_ttl_evicts_idle_keys(spark, tmp_path):
    """With state_ttl_secs, a key idle past the TTL in EVENT time has its
    state evicted when the watermark passes last-seen + TTL (bounded state
    ≙ the reference limiter's bounded cache). Observable semantics: after
    eviction, events landing back in the SAME (exhausted) event-time
    window get a fresh quota; without eviction they'd be dropped."""
    import time as _t
    from datetime import datetime, timezone

    src = tmp_path / "ttl_src"
    src.mkdir()
    schema = "event_id long, event_ts timestamp, event_type string, value double"
    ts = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _t.sleep(1.1)  # distinct mod-times → deterministic batch order

    # b1: 'k' exhausts window [600,1200): threshold 2 keeps 2 of 3;
    #     expiry = last_seen 1002 + ttl 100 = 1102
    write_file([(i, ts(1000 + i), "k", 0.0) for i in range(3)])
    # b2: watermark advances to 1002 (< 1102: no eviction); wm source 1110
    write_file([(10, ts(1110), "other", 0.0)])
    # b3: watermark now 1110 > 1102 → 'k' evicted this batch
    write_file([(11, ts(1115), "other", 0.0)])
    # b4: 'k' again, ts 1150-1151 — still window [600,1200), and ≥ the
    #     1115 watermark so not late-filtered: fresh quota admits both
    write_file([(20, ts(1150), "k", 0.0), (21, ts(1151), "k", 0.0)])

    sdf = stream_throttle(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        threshold=2,
        window_secs=600,
        key_field="event_type",
        state_ttl_secs=100,
        watermark="0 seconds",
    )
    out = _run_to_memory(spark, sdf, "thr_ttl", tmp_path)
    kept = sorted(
        r.event_ts.timestamp() for r in out.filter("event_type = 'k'").collect()
    )
    # without eviction the exhausted window would drop the b4 events
    assert kept == [1000.0, 1001.0, 1150.0, 1151.0]
    assert out.filter("event_type = 'other'").count() == 2


def test_kafka_builders_shape(spark):
    """No broker/jar in this image — validate the config surface: option
    map parity with the reference's kafka source config, decoder
    validation, and the sink's value encoding (batch-applied: the column
    logic is stream/batch agnostic)."""
    from vector_spark.streaming.kafka import (
        kafka_source_options,
        read_kafka_stream,
        write_kafka_stream,
    )

    opts = kafka_source_options(
        "b1:9092,b2:9092", ["t1", "t2"], group_id="g",
        auto_offset_reset="earliest",
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "t1,t2",
        "startingOffsets": "earliest",
        "kafka.group.id": "g",
    }
    with pytest.raises(ValueError, match="unknown decoder"):
        read_kafka_stream(spark, "b:9092", ["t"], decoder="nope")
    # sink value encoding: same expression applied to a batch frame
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    enc = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    assert enc.collect()[0].value == '{"a":1,"b":"x"}'


def test_rocksdb_state_store_same_results(spark, events_path, tmp_path):
    """The RocksDB provider changes WHERE state lives (disk-spillable
    instead of executor heap), never the results: the same stateful
    dedupe + windowed aggregate produce identical rows under both
    providers, and the RocksDB run reports rocksdb state metrics."""
    from vector_spark.streaming import use_default_state, use_rocksdb_state

    def run(name):
        sdf = stream_aggregate(
            _read_stream(spark, events_path),
            series_cols=["event_type"],
            interval_secs=100,
            mode="sum",
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / name))
            .start()
        )
        q.processAllAvailable()
        progress = q.lastProgress
        q.stop()
        rows = sorted(map(tuple, spark.table(name).collect()))
        return rows, progress

    use_rocksdb_state(spark)
    try:
        rocks_rows, rocks_prog = run("rocks_agg")
    finally:
        use_default_state(spark)
    heap_rows, _ = run("heap_agg")

    assert rocks_rows == heap_rows
    mem = str((rocks_prog or {}).get("stateOperators", ""))
    assert "rocksdb" in mem.lower(), "RocksDB provider was not active"


def test_stream_vrl_remap_program(spark, events_path, tmp_path):
    """A compiled VRL program is a pure projection, so it runs UNCHANGED on
    a streaming frame — the reference's remap-in-a-stream topology with no
    extra machinery (vrl.py scale contract)."""
    from vector_spark.vrl import remap_program

    sdf = _read_stream(spark, events_path)
    out = remap_program(
        sdf,
        """
        .etype = upcase(string!(.event_type))
        if .value >= 5.0 { .band = "hi" } else { .band = "lo" }
        """,
        drop_on_error=True,
        reroute_dropped=False,
    )["primary"]
    got = _run_to_memory(spark, out, "vrl_stream", tmp_path)
    rows = got.collect()
    assert len(rows) == 100
    assert {r.etype for r in rows} == {"T0", "T1", "T2", "T3"}
    assert all((r.band == "hi") == (r.value >= 5.0) for r in rows)


def test_stream_aggregate_latest_mode(spark, tmp_path):
    import time as _t
    from datetime import datetime, timezone

    from vector_spark.streaming.stream import stream_aggregate

    ts = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    schema = "event_id long, event_ts timestamp, event_type string, value double"
    rows = [
        (0, ts(10), "k", 1.0),
        (1, ts(90), "k", 7.0),   # latest in window [0,100)
        (2, ts(50), "k", 3.0),
        (3, ts(100000), "k", 0.0),  # sentinel advances the watermark
    ]
    p = tmp_path / "lat"
    spark.createDataFrame(rows, schema).write.parquet(str(p))
    sdf = stream_aggregate(
        spark.readStream.schema(schema).parquet(str(p)),
        series_cols=["event_type"],
        interval_secs=100,
        watermark="0 seconds",
        mode="latest",
    )
    out = _run_to_memory(spark, sdf, "agg_latest", tmp_path)
    first = [r for r in out.collect() if r.window_start == ts(0)]
    assert len(first) == 1 and first[0].agg_value == 7.0


def test_stream_aggregate_diff_mode_spanning_batches(spark, tmp_path):
    """Diff mode (aggregate.rs:250-262): each final window emits its sum
    minus the previous window's sum; a window whose rows span micro-batches
    must still sum completely (partials carry in state)."""
    import time as _t
    from datetime import datetime, timezone

    from vector_spark.streaming.stream import stream_aggregate_diff

    ts = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    schema = "event_id long, event_ts timestamp, event_type string, value double"
    src = tmp_path / "diff_src"
    src.mkdir()

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _t.sleep(1.1)

    write_file([(0, ts(10), "k", 1.0), (1, ts(20), "k", 2.0),
                (2, ts(110), "k", 5.0)])
    write_file([(3, ts(150), "k", 7.0),   # window 100 spans batches: 5+7
                (4, ts(310), "k", 9.0)])
    write_file([(5, ts(420), "k", 1.0)])
    write_file([(6, ts(1000), "k", 0.0)])  # advances watermark → win 300 final

    sdf = stream_aggregate_diff(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        series_col="event_type",
        interval_secs=100,
        watermark="0 seconds",
    )
    out = _run_to_memory(spark, sdf, "agg_diff", tmp_path)
    rows = sorted(out.collect(), key=lambda r: r.window_start)
    got = [(r.window_start, r.agg_value, r.diff) for r in rows]
    # first-ever window has no predecessor → NULL diff
    assert got[0][:2] == (ts(0), 3.0) and got[0][2] is None
    assert got[1] == (ts(100), 12.0, 9.0)  # spanning window fully summed
    assert got[2] == (ts(300), 9.0, -3.0)


def test_topology_config_runs_as_stream_with_equal_sink_counts(spark, tmp_path):
    """The SAME topology config executes batch or streaming (run_streaming):
    transforms and sink encoders are pure column programs, so compiling
    the config over readStream frames needs zero changes — and the
    north-rule invariant holds: per-sink emitted counts match the batch
    run on the same input."""
    from vector_spark.plans.topology import compile_config, run_streaming
    from vector_spark.tables import sequences

    p = str(tmp_path / "seq_src")
    sequences(spark, 500).write.parquet(p)
    config = {
        "sources": {"seq": {"type": "sequences", "n": 500}},
        "transforms": {
            "mark": {
                "type": "remap",
                "inputs": ["seq"],
                "source": '.bucket = if .n_tok >= 64 { "big" } else { "small" }',
            },
            "keep": {
                "type": "filter",
                "inputs": ["mark"],
                "condition": '.source != "web" || .n_tok >= 16',
            },
            "rt": {
                "type": "route",
                "inputs": ["keep"],
                "routes": {"big": '.bucket == "big"', "small": '.bucket == "small"'},
            },
        },
        "sinks": {
            "big_sink": {"type": "memory", "inputs": ["rt.big"]},
            "small_sink": {"type": "memory", "inputs": ["rt.small"]},
        },
    }
    batch = compile_config(spark, config).write_sinks()

    schema = spark.read.parquet(p).schema
    stream_counts = run_streaming(
        spark,
        config,
        source_streams={"seq": spark.readStream.schema(schema).parquet(p)},
        checkpoint_root=str(tmp_path / "ck_topo"),
        query_prefix="topo_eq",
    )
    assert stream_counts == {
        "big_sink": batch["big_sink"],
        "small_sink": batch["small_sink"],
    }
    assert sum(stream_counts.values()) > 0


def test_stream_sample_counter_mode_matches_batch(spark, tmp_path):
    """Counter-mode sample keeps rows 1, 1+rate, … PER GROUP across
    micro-batches — the persistent counter must continue where the last
    batch stopped, matching the batch operator on the concatenated data."""
    from vector_spark.operators.sample import sample as batch_sample
    from vector_spark.streaming import stream_sample

    schema = "event_id long, event_ts timestamp, k string, v double"
    src = tmp_path / "sample_src"
    src.mkdir()

    def mk(ids):
        return spark.createDataFrame(
            [
                (i, None, f"k{i % 2}", float(i))
                for i in ids
            ],
            schema,
        ).withColumn(
            "event_ts", F.timestamp_seconds(1704067200 + F.col("event_id"))
        )

    mk(range(0, 10)).coalesce(1).write.parquet(str(src / "f0"))
    mk(range(10, 20)).coalesce(1).write.parquet(str(src / "f1"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = _run_to_memory(
        spark,
        stream_sample(sdf, rate=3, group_by=["k"], order_by="event_id"),
        "smp_out",
        tmp_path,
    )
    got = sorted(r.event_id for r in out.collect())

    full = mk(range(0, 20))
    want = sorted(
        r.event_id
        for r in batch_sample(
            full, rate=3, group_by=["k"], order_by="event_id"
        ).collect()
    )
    assert got == want
    # every kept row carries the stamp (no exclude in play)
    assert all(r.sample_rate == 3 for r in out.collect())


def test_stream_sample_exclude_bypasses_counter(spark, tmp_path):
    """Exclude matches forward unsampled, unstamped, and never consume a
    stride slot (transform.rs:52-64) — identical to the batch contract."""
    from vector_spark.streaming import stream_sample

    schema = "event_id long, event_ts timestamp, k string, v double"
    df = spark.createDataFrame(
        [(i, None, "a", float(i)) for i in range(12)], schema
    ).withColumn("event_ts", F.timestamp_seconds(1704067200 + F.col("event_id")))
    p = str(tmp_path / "sample_excl")
    df.coalesce(1).write.parquet(p)
    sdf = spark.readStream.schema(schema).parquet(p)
    out = _run_to_memory(
        spark,
        stream_sample(
            sdf,
            rate=4,
            group_by=["k"],
            order_by="event_id",
            exclude=F.col("event_id") % 3 == 0,
        ),
        "smp_excl",
        tmp_path,
    ).collect()
    by_id = {r.event_id: r for r in out}
    # ids 0,3,6,9 excluded → pass through unstamped; the sampler numbers
    # only 1,2,4,5,7,8,10,11 → keeps positions 1 and 5: ids 1 and 7
    assert sorted(by_id) == [0, 1, 3, 6, 7, 9]
    assert by_id[1].sample_rate == 4 and by_id[7].sample_rate == 4
    assert all(by_id[i].sample_rate is None for i in (0, 3, 6, 9))


def test_stream_tag_cardinality_drop_tag_across_batches(spark, tmp_path):
    """First value_limit distinct values claim the slots (arrival order,
    carried across micro-batches); later values null out; null tags pass."""
    from vector_spark.streaming import stream_tag_cardinality

    schema = "event_id long, event_ts timestamp, tag string"
    src = tmp_path / "tcl_src"
    src.mkdir()
    b0 = [(0, "u1"), (1, "u2"), (2, "u1"), (3, None)]
    b1 = [(4, "u3"), (5, "u2"), (6, "u4"), (7, None)]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(
            [(eid, None, t) for eid, t in rows], schema
        ).withColumn(
            "event_ts", F.timestamp_seconds(1704067200 + F.col("event_id"))
        ).coalesce(1).write.parquet(str(src / f"f{i}"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = _run_to_memory(
        spark,
        stream_tag_cardinality(sdf, "tag", value_limit=2, order_by="event_id"),
        "tcl_out",
        tmp_path,
    ).collect()
    got = {r.event_id: r.tag for r in out}
    # u1,u2 claim the two slots in batch 0; u3,u4 (batch 1) are over-limit
    assert got == {0: "u1", 1: "u2", 2: "u1", 3: None,
                   4: None, 5: "u2", 6: None, 7: None}


def test_stream_tag_cardinality_drop_event(spark, tmp_path):
    from vector_spark.streaming import stream_tag_cardinality

    schema = "event_id long, event_ts timestamp, tag string"
    df = spark.createDataFrame(
        [(0, None, "a"), (1, None, "b"), (2, None, "c"),
         (3, None, "a"), (4, None, None)],
        schema,
    ).withColumn("event_ts", F.timestamp_seconds(1704067200 + F.col("event_id")))
    p = str(tmp_path / "tcl_drop")
    df.coalesce(1).write.parquet(p)
    sdf = spark.readStream.schema(schema).parquet(p)
    out = _run_to_memory(
        spark,
        stream_tag_cardinality(
            sdf, "tag", value_limit=2, action="drop_event",
            order_by="event_id",
        ),
        "tcl_drop",
        tmp_path,
    ).collect()
    # c is over-limit → event 2 dropped; null tag (4) passes through
    assert sorted(r.event_id for r in out) == [0, 1, 3, 4]


def test_stateful_config_runs_as_stream_with_equal_sink_counts(
    spark, tmp_path
):
    """A config chaining STATEFUL transform types (sample counter →
    throttle → dedupe → aggregate) executes as Structured Streaming via
    the topology's streaming dispatch — per-sink counts equal the batch
    run on the same single-batch input (the north-rule invariant)."""
    from vector_spark.plans.topology import compile_config, run_streaming

    schema = "event_id long, event_ts timestamp, event_type string, value double"
    df = spark.range(400).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 5).alias("event_ts"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        (F.col("id") % 11).cast("double").alias("value"),
    )
    p = str(tmp_path / "stateful_src")
    df.coalesce(1).write.parquet(p)

    # one stateful transform per sink path: Spark permits a single
    # applyInPandasWithState per streaming query — chains of stateful
    # transforms run as staged queries (write intermediate, stream on)
    config = {
        "sources": {"ev": {"type": "events"}},
        "transforms": {
            "smp": {
                "type": "sample",
                "inputs": ["ev"],
                "rate": 2,
                "group_by": ["event_type"],
                "order_by": "event_id",
            },
            "thr": {
                "type": "throttle",
                "inputs": ["ev"],
                "threshold": 20,
                "window_secs": 600,
                "key_field": "event_type",
            },
            "dd": {
                "type": "dedupe",
                "inputs": ["ev"],
                "match": ["event_type", "value"],
                "order_by": ["event_id"],
            },
            "agg": {
                "type": "aggregate",
                "inputs": ["ev"],
                "series_cols": ["event_type"],
                "interval_secs": 300,
                "mode": "sum",
            },
        },
        "sinks": {
            "sampled": {"type": "memory", "inputs": ["smp"]},
            "limited": {"type": "memory", "inputs": ["thr"]},
            "uniq": {"type": "memory", "inputs": ["dd"]},
            "series": {"type": "memory", "inputs": ["agg"]},
        },
    }

    batch = compile_config(
        spark, config, overrides={"ev": spark.read.parquet(p)}
    ).write_sinks()
    stream_counts = run_streaming(
        spark,
        config,
        source_streams={
            "ev": spark.readStream.schema(schema).parquet(p)
        },
        checkpoint_root=str(tmp_path / "ck_stateful"),
        query_prefix="topo_stateful",
    )
    # row-level stateful sinks match the batch run exactly
    for k in ("sampled", "limited", "uniq"):
        assert stream_counts[k] == batch[k], k
    # the windowed sink follows append-mode semantics: it emits exactly
    # the windows CLOSED by the final watermark (end <= max_ts - 30s);
    # batch emits every window including still-open ones
    closed = (
        spark.read.parquet(p)
        .groupBy(F.window("event_ts", "300 seconds"), "event_type")
        .count()
        .filter(
            F.col("window.end")
            <= F.lit(1704067200 + 399 * 5 - 30).cast("timestamp")
        )
        .count()
    )
    assert stream_counts["series"] == closed
    assert 0 < stream_counts["series"] <= batch["series"]
    assert all(v > 0 for v in stream_counts.values())


def test_chained_stateful_config_streams_via_staging(spark, tmp_path):
    """A config CHAINING two applyInPandasWithState transforms (sample →
    throttle) streams end-to-end: the topology cuts the plan at the
    second stateful operator, flushing the sampled stage to a
    checkpointed parquet stage and streaming the throttle from it —
    per-sink counts equal the batch run (reference disk-buffer parity)."""
    from vector_spark.plans.topology import compile_config, run_streaming

    schema = "event_id long, event_ts timestamp, event_type string, value double"
    df = spark.range(300).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 5).alias("event_ts"),
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias(
            "event_type"
        ),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    p = str(tmp_path / "chain_src")
    df.coalesce(1).write.parquet(p)

    config = {
        "sources": {"ev": {"type": "events"}},
        "transforms": {
            "smp": {
                "type": "sample",
                "inputs": ["ev"],
                "rate": 2,
                "group_by": ["event_type"],
                "order_by": "event_id",
            },
            "thr": {
                "type": "throttle",
                "inputs": ["smp"],
                "threshold": 10,
                "window_secs": 600,
                "key_field": "event_type",
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["thr"]}},
    }
    batch = compile_config(
        spark, config, overrides={"ev": spark.read.parquet(p)}
    ).write_sinks()
    stream_counts = run_streaming(
        spark,
        config,
        source_streams={"ev": spark.readStream.schema(schema).parquet(p)},
        checkpoint_root=str(tmp_path / "ck_chain"),
        query_prefix="topo_chain",
    )
    assert stream_counts == batch
    assert stream_counts["out"] > 0
    # the stage actually materialized on disk
    import os

    staged = os.path.join(str(tmp_path / "ck_chain"), "__staging", "stage_thr")
    assert os.path.isdir(staged)
