"""Structured Streaming variants of the stateful (Task-flavor) operators.

The reference's stateful transforms are processing-time streaming
(SURVEY.md §2.8: tumbling flush on a tokio interval, wall-clock session
staleness, GCRA throttle). The streaming engine here upgrades them to
event-time with watermarks — a strict superset (late data handled instead
of silently mis-windowed):

- aggregate (src/transforms/aggregate.rs)      → windowed agg + watermark
  (sum/count/max/min/mean/stdev/latest; Diff mode → stream_aggregate_diff,
  a stateful operator carrying the previous flush per series)
- dedupe LRU cache (src/transforms/dedupe)     → dropDuplicates + watermark
  (state TTL ≙ the reference's bounded cache)
- reduce sessions (src/transforms/reduce)      → session_window(gap); the
  condition-driven close (ends_when/starts_when/max_events/expire) →
  stream_reduce, a stateful operator bit-exact vs the batch reduce
- throttle GCRA (src/transforms/throttle.rs)   → applyInPandasWithState
  per-key token counting per window
- sample counter mode (src/transforms/sample)  → stream_sample, a
  persistent per-bucket modulo counter (hash mode is stateless — the
  batch column program runs on streams unchanged)
- tag_cardinality_limit                        → stream_tag_cardinality,
  the accepted-value set carried as bounded state

With these, every stateful reference transform has a streaming execution
path; the stateless ones (remap/filter/route/enrich/log_to_metric/...)
are pure column programs that run on streaming frames as-is.

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
    DoubleType,
    LongType,
    StringType,
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
        # Latest (aggregate.rs Auto for absolute metrics): last value in
        # event-time order within the window
        "latest": F.max_by(value_col, ts_col),
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
    # full-row passthrough: kept events emerge unchanged (the reference
    # throttle forwards the event itself), so the operator composes in a
    # topology — not just as a (key, ts) sample
    out_schema = StructType(list(events.schema.fields))
    out_cols = [f.name for f in events.schema.fields]
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
                yield pdf.loc[keep, out_cols]
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


def stream_aggregate_diff(
    events: DataFrame,
    series_col: str,
    value_col: str = "value",
    ts_col: str = "event_ts",
    interval_secs: int = 10,
    watermark: str = "30 seconds",
) -> DataFrame:
    """The aggregate transform's ``Diff`` mode (aggregate.rs:250-262 —
    each flush emits current value MINUS the previous flush's value) on a
    stream: a custom stateful operator keyed by series.

    State per key = the last EMITTED window's (start, sum) + the pending
    (not-yet-final) windows' partial sums as JSON — a window may span
    micro-batches, so partial sums must carry until the watermark passes
    the window end and no more rows can arrive (rows below the watermark
    are late-dropped by the engine before the stateful op). Per batch the
    work is one pandas groupby over windows then a vectorized shift-diff
    across the final window sequence; the batch analog is the F.lag
    window in operators/aggregate.py. Pending state is bounded by
    (watermark delay / interval) windows per key.
    """
    events = events.withWatermark(ts_col, watermark)
    out_schema = StructType(
        [
            StructField("series", events.schema[series_col].dataType, True),
            StructField("window_start", TimestampType(), True),
            StructField("agg_value", DoubleType(), True),
            StructField("diff", DoubleType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_win", LongType(), True),
            StructField("last_val", DoubleType(), True),
            StructField("pending_json", StringType(), True),
        ]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import json

        import numpy as np

        if state.exists:
            last_win, last_val, pending_json = state.get
            pending: dict[int, float] = {
                int(k): v for k, v in json.loads(pending_json).items()
            }
        else:
            last_win, last_val, pending = -1, None, {}
        wm_ms = state.getCurrentWatermarkMs()
        # a window is final once the watermark has passed its end
        final_below = (wm_ms // 1000) - (wm_ms // 1000) % interval_secs
        for pdf in pdfs:
            if pdf.empty:
                continue
            secs = pdf[ts_col].astype("int64").to_numpy() // 10**9
            win = secs - secs % interval_secs
            sums = (
                pd.DataFrame({"w": win, "v": pdf[value_col].to_numpy()})
                .groupby("w", sort=True)["v"]
                .sum()
            )
            for w, v in sums.items():
                pending[int(w)] = pending.get(int(w), 0.0) + float(v)
        ready = sorted(w for w in pending if w < final_below)
        if ready:
            vals = np.array([pending.pop(w) for w in ready], dtype=float)
            prev = np.r_[np.nan, vals[:-1]]
            if last_val is not None and ready[0] > last_win:
                prev[0] = last_val
            last_win, last_val = int(ready[-1]), float(vals[-1])
            yield pd.DataFrame(
                {
                    "series": key[0],
                    "window_start": pd.to_datetime(ready, unit="s"),
                    "agg_value": vals,
                    "diff": vals - prev,
                }
            )
        if last_val is not None or pending:
            state.update((last_win, last_val, json.dumps(pending)))

    return events.groupBy(series_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


# Streaming-supported reduce merge strategies (subset of the batch
# operator's table — merge_strategy.rs:15-53). Accumulators must be
# JSON-serializable in the state store, so Regex/Object values are out.
_COMBINE_LIST = {"array", "concat", "concat_newline", "concat_raw", "flat_unique"}
_STREAM_STRATEGIES = _COMBINE_LIST | {
    "discard", "retain", "sum", "max", "min", "shortest_array", "longest_array"
}


def stream_reduce(
    events: DataFrame,
    group_by: str,
    merge_strategies: dict[str, str],
    ts_col: str = "event_ts",
    ends_when=None,
    starts_when=None,
    max_events: int | None = None,
    expire_after_secs: float | None = None,
    watermark: str = "30 seconds",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming ``reduce`` with condition-driven session close — the
    reference's most stateful transform (src/transforms/reduce/
    transform.rs:217-304) as a custom stateful operator.

    Semantics (matching the batch ``operators/reduce.py`` split rules):
    an event matching ``ends_when`` CLOSES the running session and is
    included in it; an event matching ``starts_when`` flushes the running
    session and OPENS a new one with itself; ``max_events`` flushes a
    session at the cap; ``expire_after_secs`` flushes a session whose key
    has been idle past the gap in EVENT time (EventTimeTimeout — replay-
    stable, unlike the reference's wall clock).

    Scale/shape notes:
    - ``ends_when``/``starts_when`` compile through the SAME condition
      compiler as batch (``conditions.to_column``) and are evaluated
      JVM-side as vectorized boolean columns BEFORE the stateful op —
      the Python side only reads precomputed flags, never re-parses
      predicates per row.
    - Inside ``applyInPandasWithState`` the per-batch work is a sort +
      numpy cumulative session labeling + one pandas groupby; Python cost
      is per-SESSION (agg finalization), not per-row.
    - State per key is ONE open accumulator (JSON blob + counters), not
      buffered events — bounded regardless of session length for scalar
      strategies; list strategies grow with distinct/merged values exactly
      like the reference's in-memory merged event.
    - Only sessions closed by a condition / cap / timeout are emitted
      (append mode); the open tail stays in state across micro-batches.
    """
    from vector_spark.conditions import to_column

    unknown = {s for s in merge_strategies.values()} - _STREAM_STRATEGIES
    if unknown:
        raise ValueError(f"unsupported streaming merge strategies: {unknown}")

    events = events.withColumn(
        "__ends",
        to_column(ends_when, events) if ends_when is not None else F.lit(False),
    ).withColumn(
        "__starts",
        to_column(starts_when, events) if starts_when is not None else F.lit(False),
    )
    if expire_after_secs is not None:
        events = events.withWatermark(ts_col, watermark)

    in_types = {f.name: f.dataType for f in events.schema.fields}

    def _out_type(field: str, strategy: str):
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            StringType,
        )

        t = in_types[field]
        if strategy in ("concat", "concat_newline", "concat_raw"):
            return StringType()
        if strategy == "array":
            return ArrayType(t)
        if strategy == "flat_unique":
            return t if isinstance(t, ArrayType) else ArrayType(t)
        if strategy == "sum":
            return LongType() if isinstance(t, IntegerType) else (
                t if isinstance(t, (LongType, DoubleType)) else DoubleType()
            )
        return t

    fields = list(merge_strategies)
    out_schema = StructType(
        [StructField(group_by, in_types[group_by], True),
         StructField("session_start", TimestampType(), True),
         StructField("session_end", TimestampType(), True)]
        + [StructField(f, _out_type(f, s), True)
           for f, s in merge_strategies.items()]
        + [StructField("events_count", LongType(), True)]
    )
    # state = one open accumulator: raw per-field values as JSON + counters
    state_schema = StructType(
        [
            StructField("acc_json", StringType(), True),
            StructField("count", LongType(), True),
            StructField("start_us", LongType(), True),
            StructField("last_us", LongType(), True),
        ]
    )
    sort_cols = [ts_col] + [c for c in (order_cols or []) if c != ts_col]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import json

        import numpy as np

        def finalize(acc: dict, count: int, start_us: int, end_us: int) -> dict:
            row = {
                group_by: key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "events_count": count,
            }
            for f, s in merge_strategies.items():
                v = acc.get(f)
                if v is None:
                    row[f] = None
                elif s == "concat":
                    row[f] = " ".join(str(x) for x in v)
                elif s == "concat_newline":
                    row[f] = "\n".join(str(x) for x in v)
                elif s == "concat_raw":
                    row[f] = "".join(str(x) for x in v)
                elif s == "flat_unique":
                    flat: list = []
                    for x in v:
                        flat.extend(x) if isinstance(x, list) else flat.append(x)
                    row[f] = list(dict.fromkeys(flat))
                else:
                    row[f] = v
            return row

        def combine(a, b, s: str):
            if a is None:
                return b
            if b is None:
                return a
            if s == "sum":
                return a + b
            if s == "max":
                return max(a, b)
            if s == "min":
                return min(a, b)
            if s == "discard":
                return a
            if s == "retain":
                return b
            if s == "shortest_array":
                return min(a, b, key=len)
            if s == "longest_array":
                return max(a, b, key=len)
            return list(a) + list(b)  # list-accumulated strategies

        if expire_after_secs is not None and state.hasTimedOut:
            if state.exists:
                acc_json, count, start_us, last_us = state.get
                state.remove()
                yield pd.DataFrame(
                    [finalize(json.loads(acc_json), count, start_us, last_us)],
                    columns=[f.name for f in out_schema.fields],
                )
            else:
                state.remove()
            return

        if state.exists:
            acc_json, count, start_us, last_us = state.get
            open_acc: dict | None = json.loads(acc_json)
        else:
            open_acc, count, start_us, last_us = None, 0, 0, 0

        out_rows: list[dict] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            n = len(pdf)
            ends = pdf["__ends"].fillna(False).to_numpy(dtype=bool)
            starts = pdf["__starts"].fillna(False).to_numpy(dtype=bool)
            brk = starts.copy()
            brk[1:] |= ends[:-1]
            sess = np.cumsum(brk)  # 0-based id; 0 may continue open state
            # position within session, offset by carried count for sess 0
            idx = np.arange(n)
            first_of_sess = np.r_[True, sess[1:] != sess[:-1]]
            pos = idx - np.maximum.accumulate(np.where(first_of_sess, idx, 0))
            if open_acc is not None and (n == 0 or not brk[0]):
                pos = pos + np.where(sess == 0, count, 0)
            elif open_acc is not None:
                # starts_when (or a boundary) flushed the open session
                out_rows.append(finalize(open_acc, count, start_us, last_us))
                open_acc, count = None, 0
            fid = sess * (10**9) + (
                pos // max_events if max_events is not None else 0
            )
            ts_us = pdf[ts_col].astype("int64").to_numpy() // 1000
            uniq, starts_i = np.unique(fid, return_index=True)
            bounds = np.r_[starts_i, n]
            for gi, g0 in enumerate(starts_i):
                g1 = bounds[gi + 1]
                chunk = pdf.iloc[g0:g1]
                continuing = (
                    open_acc is not None and sess[g0] == 0 and pos[g0] != 0
                )
                acc: dict = open_acc if continuing else {}
                g_count = (count if continuing else 0) + (g1 - g0)
                g_start = start_us if continuing else int(ts_us[g0])
                g_end = int(ts_us[g1 - 1])
                for f, s in merge_strategies.items():
                    col = chunk[f]
                    vals = col.dropna()
                    if s == "sum":
                        b = vals.sum() if len(vals) else None
                        b = None if b is None else (
                            float(b) if col.dtype.kind == "f" else int(b)
                        )
                    elif s == "max":
                        b = vals.max() if len(vals) else None
                    elif s == "min":
                        b = vals.min() if len(vals) else None
                    elif s == "discard":
                        b = col.iloc[0]
                        b = None if pd.isna(b) else b
                    elif s == "retain":
                        b = col.iloc[-1]
                        b = None if pd.isna(b) else b
                    elif s == "shortest_array":
                        b = min(vals, key=len) if len(vals) else None
                    elif s == "longest_array":
                        b = max(vals, key=len) if len(vals) else None
                    else:  # list-accumulated
                        b = [
                            v.tolist() if hasattr(v, "tolist") else v
                            for v in vals
                        ] or None
                    if hasattr(b, "item"):
                        b = b.item()
                    acc[f] = combine(acc.get(f), b, s)
                closed_by_cap = (
                    max_events is not None and g_count % max_events == 0
                )
                is_last = g1 == n
                if not is_last or bool(ends[g1 - 1]) or closed_by_cap:
                    out_rows.append(finalize(acc, g_count, g_start, g_end))
                    open_acc, count = None, 0
                else:
                    open_acc, count = acc, g_count
                    start_us, last_us = g_start, g_end
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[f.name for f in out_schema.fields]
            )
        if open_acc is not None:
            state.update((json.dumps(open_acc), count, start_us, last_us))
            if expire_after_secs is not None:
                expiry = (
                    max(last_us // 1000, state.getCurrentWatermarkMs() + 1)
                    + int(expire_after_secs * 1000)
                )
                state.setTimeoutTimestamp(expiry)
        elif state.exists:
            state.remove()

    timeout = (
        GroupStateTimeout.NoTimeout
        if expire_after_secs is None
        else GroupStateTimeout.EventTimeTimeout
    )
    return events.groupBy(group_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def stream_sample(
    events: DataFrame,
    rate: int,
    group_by: list[str] | None = None,
    order_by: str = "event_ts",
    exclude=None,
    stamp: bool = True,
) -> DataFrame:
    """Streaming counter-mode sample (reference src/transforms/sample/
    transform.rs:107-117): one persistent modulo counter per ``group_by``
    bucket, carried ACROSS micro-batches — rows 1, 1+rate, 1+2·rate … of
    each bucket's lifetime pass. (Keyed hash mode is stateless — the batch
    ``operators.sample`` column program runs on a stream unchanged; only
    counter mode needs state.)

    Parity details mirrored from the batch operator: ``exclude`` matches
    bypass the sampler entirely (forwarded, never counted, never stamped —
    transform.rs:52-64); kept sampled rows are stamped ``sample_rate``
    (transform.rs:120-136). Within a micro-batch rows are ordered by
    ``order_by``; across batches the counter continues where it left off
    (arrival order, exactly the reference's behavior).

    State: ONE int64 per bucket — bounded by the bucket-key cardinality.
    With ``group_by=None`` all rows share a single counter (one state
    group): fine for post-aggregation metric streams, wrong for raw
    10^12-row firehoses — key it, or use hash mode (SCALING.md).
    """
    if rate <= 0:
        raise ValueError("rate must be >= 1")
    from vector_spark.conditions import to_column

    src_fields = list(events.schema.fields)
    events = events.withColumn(
        "__excl",
        to_column(exclude, events) if exclude is not None else F.lit(False),
    )
    keys = group_by or []
    if not keys:
        # a literal grouping expression isn't a resolvable attribute for
        # FlatMapGroupsInPandasWithState — materialize the constant key
        events = events.withColumn("__g", F.lit(1))
        keys = ["__g"]
    grouped = events.groupBy(*keys)
    out_schema = StructType(
        src_fields
        + ([StructField("sample_rate", LongType(), True)] if stamp else [])
    )
    state_schema = StructType([StructField("count", LongType(), True)])
    out_cols = [f.name for f in src_fields]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_by, kind="stable")
            thru = ~pdf["__excl"].fillna(False).to_numpy()
            pos = count + thru.cumsum()
            keep = (~thru) | (thru & (((pos - 1) % rate) == 0))
            count = int(pos[-1]) if len(pos) else count
            kept = pdf.loc[keep]
            if kept.empty:
                continue
            out = kept[out_cols].copy()
            if stamp:
                # pd nullable Int64: excluded rows keep a null stamp
                out["sample_rate"] = pd.array(
                    [None if e else rate for e in kept["__excl"]],
                    dtype="Int64",
                )
            yield out
        state.update((count,))

    return grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_tag_cardinality(
    events: DataFrame,
    tag: str,
    value_limit: int,
    action: str = "drop_tag",
    order_by: str = "event_ts",
) -> DataFrame:
    """Streaming tag_cardinality_limit (reference src/transforms/
    tag_cardinality_limit): the first ``value_limit`` DISTINCT values of
    ``tag`` ever seen are accepted; an event carrying a new value beyond
    the limit either loses the tag (``drop_tag`` → null) or is dropped
    (``drop_event``). Null tags pass through untouched and never occupy a
    slot (the batch operator's contract).

    State: the accepted-value set — ONE group keyed by the tag name,
    bounded at ``value_limit`` strings (the reference holds exactly this
    set in a single in-memory HashSet, mod.rs). Per micro-batch all rows
    visit one task, which is precisely the operator's purpose: it runs on
    metric/tag streams AFTER aggregation, where a micro-batch is small but
    the value domain explodes over time. For raw-event firehoses enforce
    per-key limits upstream instead (SCALING.md).
    """
    if action not in ("drop_tag", "drop_event"):
        raise ValueError(f"unknown action {action!r}")
    src_fields = list(events.schema.fields)
    out_schema = StructType(src_fields)
    state_schema = StructType(
        [StructField("accepted", StringType(), True)]
    )
    out_cols = [f.name for f in src_fields]
    SEP = "\x1f"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (packed,) = state.get if state.exists else ("",)
        accepted: list[str] = packed.split(SEP) if packed else []
        seen = set(accepted)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_by, kind="stable")
            vals = pdf[tag]
            nonnull = vals.notna()
            # first-arrival distinct new values claim the remaining slots
            for v in pd.unique(vals[nonnull]):
                if len(seen) >= value_limit:
                    break
                if v not in seen:
                    seen.add(v)
                    accepted.append(v)
            ok = (~nonnull) | vals.isin(seen)
            if action == "drop_event":
                out = pdf.loc[ok, out_cols]
            else:
                out = pdf[out_cols].copy()
                out.loc[~ok, tag] = None
            if not out.empty:
                yield out
        state.update((SEP.join(accepted),))

    return (
        events.withColumn("__tag", F.lit(tag))
        .groupBy("__tag")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
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
