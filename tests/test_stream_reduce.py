"""stream_reduce — the reference reduce transform's condition-driven
session close (src/transforms/reduce/transform.rs:217-304) as a custom
stateful streaming operator (applyInPandasWithState).

Cross-checked against the BATCH reduce operator on the same data: when
every session is closed by an ``ends_when`` event, the streaming output
must equal the batch sessionization bit-for-bit.
"""

from __future__ import annotations

import time as _t
from datetime import datetime, timezone

from pyspark.sql import functions as F

from vector_spark.operators.reduce import reduce_events
from vector_spark.streaming.stream import stream_reduce


def _ts(s):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


SCHEMA = "event_id long, event_ts timestamp, k string, event_type string, value double, msg string"


def _run(spark, sdf, name, tmp_path):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    _t.sleep(1.1)  # distinct mod-times → deterministic batch order


def test_stream_reduce_matches_batch_on_closed_sessions(spark, tmp_path):
    """Every session ends with an 'end' event → streaming output ==
    batch reduce_events sessionization, row for row."""
    rows = []
    eid = 0
    for k in ("a", "b"):
        base = 1000 if k == "a" else 5000
        for sess in range(3):
            for i in range(4):
                is_last = i == 3
                rows.append(
                    (
                        eid,
                        _ts(base + sess * 100 + i * 10),
                        k,
                        "end" if is_last else "log",
                        float(eid % 7),
                        f"m{eid}",
                    )
                )
                eid += 1
    src = tmp_path / "src1"
    src.mkdir()
    _write(spark, src, rows)

    strategies = {"value": "sum", "msg": "concat"}
    sdf = stream_reduce(
        spark.readStream.schema(SCHEMA).parquet(str(src)),
        group_by="k",
        merge_strategies=strategies,
        ends_when='.event_type == "end"',
        order_cols=["event_id"],
    )
    out = _run(spark, sdf, "sr_batch_eq", tmp_path)
    got = sorted(
        (r.k, r.session_start, r.session_end, r.value, r.msg, r.events_count)
        for r in out.collect()
    )

    batch = reduce_events(
        spark.createDataFrame(rows, SCHEMA).withColumn(
            "ts_end", F.col("event_ts")
        ),
        group_by=["k"],
        merge_strategies={**strategies, "event_ts": "min", "ts_end": "max"},
        order_by="event_id",
        ts_col="event_ts",
        ends_when='.event_type == "end"',
    )
    want = sorted(
        (r.k, r.session_start, r.session_end, r.value, r.msg, r.events_count)
        for r in batch.select(
            "k",
            F.col("event_ts").alias("session_start"),
            F.col("ts_end").alias("session_end"),
            "value",
            "msg",
            "events_count",
        ).collect()
    )
    assert len(got) == 6  # 2 keys × 3 closed sessions
    assert got == want


def test_stream_reduce_session_spans_micro_batches(spark, tmp_path):
    """A session open at the end of batch 1 merges with batch 2's rows:
    the accumulator (sum, concat, count, session_start) carries in state."""
    src = tmp_path / "src2"
    src.mkdir()
    _write(spark, src, [(0, _ts(100), "k", "log", 1.0, "x0"),
                        (1, _ts(110), "k", "log", 2.0, "x1")])
    _write(spark, src, [(2, _ts(120), "k", "log", 3.0, "x2"),
                        (3, _ts(130), "k", "end", 4.0, "x3")])
    sdf = stream_reduce(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        group_by="k",
        merge_strategies={"value": "sum", "msg": "concat"},
        ends_when='.event_type == "end"',
        order_cols=["event_id"],
    )
    out = _run(spark, sdf, "sr_span", tmp_path).collect()
    assert len(out) == 1
    r = out[0]
    assert r.events_count == 4
    assert r.value == 10.0
    assert r.msg == "x0 x1 x2 x3"
    assert r.session_start == _ts(100) and r.session_end == _ts(130)


def test_stream_reduce_starts_when_flushes_running_session(spark, tmp_path):
    """A starts_when match flushes the running session (even without an
    ends event) and opens a new one WITH the matching event — reference
    transform.rs starts_when semantics."""
    src = tmp_path / "src3"
    src.mkdir()
    _write(spark, src, [(0, _ts(100), "k", "log", 1.0, "a"),
                        (1, _ts(110), "k", "log", 2.0, "b")])
    _write(spark, src, [(2, _ts(120), "k", "begin", 4.0, "c"),
                        (3, _ts(130), "k", "end", 8.0, "d")])
    sdf = stream_reduce(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        group_by="k",
        merge_strategies={"value": "sum"},
        ends_when='.event_type == "end"',
        starts_when='.event_type == "begin"',
        order_cols=["event_id"],
    )
    rows = sorted(
        _run(spark, sdf, "sr_starts", tmp_path).collect(),
        key=lambda r: r.session_start,
    )
    assert [(r.events_count, r.value) for r in rows] == [(2, 3.0), (2, 12.0)]


def test_stream_reduce_max_events_cap(spark, tmp_path):
    """max_events flushes at the cap; remainder stays open (no emission)."""
    src = tmp_path / "src4"
    src.mkdir()
    _write(
        spark, src,
        [(i, _ts(100 + i), "k", "log", 1.0, f"m{i}") for i in range(7)],
    )
    sdf = stream_reduce(
        spark.readStream.schema(SCHEMA).parquet(str(src)),
        group_by="k",
        merge_strategies={"value": "sum"},
        max_events=3,
        order_cols=["event_id"],
    )
    rows = sorted(
        _run(spark, sdf, "sr_cap", tmp_path).collect(),
        key=lambda r: r.session_start,
    )
    # 7 events → two full sessions of 3 emitted, 1 left open in state
    assert [(r.events_count, r.value) for r in rows] == [(3, 3.0), (3, 3.0)]


def test_stream_reduce_event_time_timeout_flush(spark, tmp_path):
    """expire_after_secs: an idle session flushes when the watermark
    passes last-seen + gap (EventTimeTimeout ≙ the reference's
    expire_after_ms staleness flush, but replay-stable event time)."""
    src = tmp_path / "src5"
    src.mkdir()
    _write(spark, src, [(0, _ts(100), "k", "log", 1.0, "a"),
                        (1, _ts(105), "k", "log", 2.0, "b")])
    # another key's much-later events advance the watermark past
    # 105 + gap(60) → k's open session times out and flushes
    _write(spark, src, [(2, _ts(1000), "other", "log", 0.0, "w1")])
    _write(spark, src, [(3, _ts(1100), "other", "log", 0.0, "w2")])
    sdf = stream_reduce(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        group_by="k",
        merge_strategies={"value": "sum", "msg": "array"},
        expire_after_secs=60,
        watermark="0 seconds",
        order_cols=["event_id"],
    )
    out = _run(spark, sdf, "sr_ttl", tmp_path)
    rows = out.filter("k = 'k'").collect()
    assert len(rows) == 1
    assert rows[0].events_count == 2
    assert rows[0].value == 3.0
    assert list(rows[0].msg) == ["a", "b"]


def test_stream_reduce_merge_strategy_shapes(spark, tmp_path):
    """retain/discard/array/flat_unique/concat_newline output shapes."""
    src = tmp_path / "src6"
    src.mkdir()
    _write(spark, src, [
        (0, _ts(100), "k", "log", 1.0, "x"),
        (1, _ts(110), "k", "log", 2.0, "y"),
        (2, _ts(120), "k", "end", 3.0, "x"),
    ])
    sdf = stream_reduce(
        spark.readStream.schema(SCHEMA).parquet(str(src)),
        group_by="k",
        merge_strategies={
            "value": "retain",
            "event_type": "discard",
            "msg": "flat_unique",
            "event_id": "max",
        },
        ends_when='.event_type == "end"',
        order_cols=["event_id"],
    )
    r = _run(spark, sdf, "sr_shapes", tmp_path).collect()[0]
    assert r.value == 3.0  # last
    assert r.event_type == "log"  # first
    assert list(r.msg) == ["x", "y"]  # unique, first-seen order
    assert r.event_id == 2
    assert r.events_count == 3


def test_stream_reduce_randomized_equivalence_with_batch(spark, tmp_path):
    """Property check: for random event layouts and random micro-batch
    splits (time-ordered arrival), the streaming operator must equal the
    batch sessionization exactly once every session is closed (a final
    'end' event per key forces that)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for k in ("a", "b", "c"):
            t = rng.randint(0, 50)
            n = rng.randint(8, 20)
            for i in range(n):
                is_end = rng.random() < 0.25 or i == n - 1
                rows.append(
                    (
                        eid,
                        _ts(1000 + t),
                        k,
                        "end" if is_end else "log",
                        float(rng.randint(0, 99)),
                        f"m{eid}",
                    )
                )
                eid += 1
                t += rng.randint(1, 30)
        rows.sort(key=lambda r: (r[1], r[0]))  # time-ordered arrival
        # random 1-3 file split at time cuts
        n_files = rng.randint(1, 3)
        cuts = sorted(rng.sample(range(1, len(rows)), n_files - 1))
        chunks = [
            rows[a:b]
            for a, b in zip([0] + cuts, cuts + [len(rows)])
        ]
        src = tmp_path / f"rand_{seed}"
        src.mkdir()
        for ch in chunks:
            _write(spark, src, ch)

        strategies = {"value": "sum", "msg": "concat", "event_id": "min"}
        sdf = stream_reduce(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            group_by="k",
            merge_strategies=strategies,
            ends_when='.event_type == "end"',
            order_cols=["event_id"],
        )
        got = sorted(
            (r.k, r.session_start, r.session_end, r.value, r.msg,
             r.event_id, r.events_count)
            for r in _run(spark, sdf, f"sr_rand_{seed}", tmp_path).collect()
        )
        batch = reduce_events(
            spark.createDataFrame(rows, SCHEMA).withColumn(
                "ts_end", F.col("event_ts")
            ),
            group_by=["k"],
            merge_strategies={
                **strategies, "event_ts": "min", "ts_end": "max"
            },
            order_by="event_id",
            ts_col="event_ts",
            ends_when='.event_type == "end"',
        )
        want = sorted(
            (r.k, r.event_ts, r.ts_end, r.value, r.msg, r.event_id,
             r.events_count)
            for r in batch.collect()
        )
        assert got == want, f"seed {seed}: stream != batch"
