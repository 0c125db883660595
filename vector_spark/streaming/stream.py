"""Structured Streaming variants of the stateful (Task-flavor) operators.

The reference's stateful transforms are processing-time streaming
(SURVEY.md §2.8: tumbling flush on a tokio interval, wall-clock session
staleness, GCRA throttle). The streaming engine here upgrades them to
event-time with watermarks — a strict superset (late data handled instead
of silently mis-windowed):

- aggregate (src/transforms/aggregate.rs)      → windowed agg + watermark
- dedupe LRU cache (src/transforms/dedupe)     → dropDuplicates + watermark
  (state TTL ≙ the reference's bounded cache)
- reduce sessions (src/transforms/reduce)      → session_window(gap)
- throttle GCRA (src/transforms/throttle.rs)   → applyInPandasWithState
  per-key token counting per window

All take a streaming DataFrame (``spark.readStream...``) and return a
streaming DataFrame; pair with ``writeStream`` + checkpointLocation for
exactly-once sinks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def stream_aggregate(
    events: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "event_ts",
    interval_secs: int = 10,
    watermark: str = "30 seconds",
    mode: str = "sum",
) -> DataFrame:
    """Tumbling-window streaming aggregate (append-mode compatible)."""
    aggs = {
        "sum": F.sum(value_col),
        "count": F.count(value_col),
        "max": F.max(value_col),
        "min": F.min(value_col),
        "mean": F.avg(value_col),
        "stdev": F.stddev_pop(value_col),
    }
    if mode not in aggs:
        raise ValueError(f"unsupported streaming aggregate mode {mode!r}")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{interval_secs} seconds").alias("__w"),
            *series_cols,
        )
        .agg(aggs[mode].alias("agg_value"), F.count(F.lit(1)).alias("events"))
        .select(F.col("__w.start").alias("window_start"), *series_cols,
                "agg_value", "events")
    )


def stream_dedupe(
    events: DataFrame,
    match: list[str],
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedupe: state TTL via watermark ≙ the reference's LRU
    cache bound (dedupe/mod.rs:24-28) — both are approximations of global
    dedup with bounded state; ours is time-bounded, theirs count-bounded."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(match)


def stream_reduce_sessions(
    events: DataFrame,
    group_by: list[str],
    gap_secs: int,
    ts_col: str = "event_ts",
    watermark: str = "30 seconds",
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Session-window reduce (expire_after_ms ≙ session gap)."""
    agg_map = {
        "sum": F.sum, "max": F.max, "min": F.min,
        "count": lambda c: F.count(c),
    }
    agg_exprs = [F.count(F.lit(1)).alias("events_count")]
    for col, how in (aggs or {}).items():
        agg_exprs.append(agg_map[how](col).alias(f"{col}_{how}"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_secs} seconds").alias("__s"),
            *group_by,
        )
        .agg(*agg_exprs)
        .select(
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            *group_by,
            "events_count",
            *[f"{col}_{how}" for col, how in (aggs or {}).items()],
        )
    )


def stream_throttle(
    events: DataFrame,
    threshold: int,
    window_secs: int,
    key_field: str,
    ts_col: str = "event_ts",
    state_ttl_secs: int | str | None = "auto",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming throttle: first ``threshold`` events per key per tumbling
    window pass; the rest drop (GCRA ≙ windowed token count). Custom
    stateful operator via ``applyInPandasWithState``: state = (window_start,
    count) per key.

    ``state_ttl_secs``: a key idle for this much EVENT time (default
    ``"auto"`` = 10 windows) has its state evicted on EventTimeTimeout
    when the watermark passes last-seen + TTL — per-key state stays
    bounded by the ACTIVE key set, not every key ever seen (the reference
    GCRA limiter's cache is likewise bounded). Eviction only forgets a
    stale window's count, which the monotonic-clock clamp already treats
    as a fresh window — semantics are unchanged. Event-time (not
    processing-time) timeout keeps eviction deterministic and
    replay-stable; ``watermark`` defaults to one window of allowed
    lateness. ``None`` disables eviction (unbounded keys — only for
    small key domains)."""
    if state_ttl_secs == "auto":
        state_ttl_secs = 10 * window_secs
    if state_ttl_secs is not None:
        events = events.withWatermark(
            ts_col, watermark or f"{window_secs} seconds"
        )
    out_schema = StructType(
        [
            StructField("key", events.schema[key_field].dataType, True),
            StructField("event_ts", TimestampType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("win_start", LongType(), True),
            StructField("count", LongType(), True),
        ]
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Monotonic window clock (reference GCRA cannot regress): a late
        # event from an older window is clamped INTO the current window —
        # it consumes current quota instead of rewinding state and
        # re-admitting past-threshold events. Fully vectorized: bucket →
        # clamp → per-bucket cumcount against carried-in state.
        import numpy as np

        if state_ttl_secs is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            win_start, count = state.get
        else:
            win_start, count = -1, 0
        last_seen_ms = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_col)
            epochs = (
                pdf[ts_col].astype("int64", copy=False).to_numpy() // 10**9
            )
            eff = np.maximum(epochs - epochs % window_secs, win_start)
            # cumulative position within each effective window (eff is
            # non-decreasing after the ts sort, so a run-length cumcount)
            starts = np.r_[True, eff[1:] != eff[:-1]]
            idx = np.arange(len(eff))
            cum = idx - np.maximum.accumulate(np.where(starts, idx, 0))
            base = np.where(eff == win_start, count, 0)
            keep = (base + cum) < threshold
            last = eff[-1]
            count = int(base[eff == last][0] if last == win_start else 0) + int(
                keep[eff == last].sum()
            )
            win_start = int(last)
            last_seen_ms = max(last_seen_ms, int(epochs[-1]) * 1000)
            if keep.any():
                kept = pdf.loc[keep]
                yield pd.DataFrame(
                    {"key": key[0], "event_ts": kept[ts_col]}
                )
        state.update((win_start, count))
        if state_ttl_secs is not None:
            # must be strictly beyond the current watermark; late-clamped
            # batches can have max-event-ts behind it
            expiry = (
                max(last_seen_ms, state.getCurrentWatermarkMs() + 1)
                + state_ttl_secs * 1000
            )
            state.setTimeoutTimestamp(expiry)

    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_secs is None
        else GroupStateTimeout.EventTimeTimeout
    )
    return events.groupBy(key_field).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(
    spark, changelog_checkpointing: bool = True
) -> None:
    """Switch stateful streaming queries started AFTER this call to the
    RocksDB state store (bundled with Spark 4).

    Why at the 10^12 tier: the default HDFS-backed provider keeps every
    key's state in executor HEAP — a watermark-bounded dedupe or windowed
    aggregate over a high-cardinality key (user, doc fingerprint) grows
    state past memory and the executor dies. RocksDB spills state to
    local disk with bounded memtables, and changelog checkpointing ships
    only per-batch deltas to the checkpoint location instead of full
    snapshots. The provider changes WHERE state lives, not what it
    contains — results are identical (pinned by
    tests/test_streaming.py::test_rocksdb_state_store_same_results).
    """
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog_checkpointing else "false",
    )


def use_default_state(spark) -> None:
    """Revert to the HDFS-backed (heap) provider for later queries."""
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
