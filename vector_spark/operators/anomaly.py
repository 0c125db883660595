"""Rate-anomaly detection over the event stream — the triage view a
log pipeline points at first: per key, how anomalous is each time
window's event COUNT against that key's own baseline (z-score over the
windowed counts). Spike and silence both surface (silence as windows
with counts far below the mean — though windows with ZERO events are
absent from the input by construction; a scheduler joining the expected
window spine closes that gap, documented below).

Scale shape: the windowed count is ONE map-side-combined aggregate
(shuffle carries (key, window, partial) rows — keys × windows, tiny);
the per-key baseline (mean, stddev over windows) aggregates the count
dim itself, and the z-score is a broadcast join of that baseline back
onto the count dim. Raw events cross the wire exactly once, as
partials. Reference analog: Vector has no anomaly transform — this is
the log_to_metric → aggregate chain plus the obvious next step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_zscores(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_secs: int = 600,
    min_windows: int = 3,
) -> DataFrame:
    """Per (key, window): event count ``n`` and its z-score against the
    key's own across-window baseline — ``z = round((n − mean)/sd, 4)``,
    0.0 for keys with degenerate baselines (fewer than ``min_windows``
    windows or zero variance, where "anomalous" is undefined).

    Returns (key, window_start, n, n_windows, z). Note: windows with no
    events at all do not appear (there is no row to count); to score
    silence, left-join a generated window spine before calling this.
    """
    counts = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.window(ts_col, f"{window_secs} seconds").alias("__w"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("key", F.col("__w.start").alias("window_start"), "n")
    )
    base = counts.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.avg("n").alias("__mean"),
        F.stddev_pop("n").alias("__sd"),
    )
    return (
        counts.join(F.broadcast(base), "key")
        .select(
            "key",
            "window_start",
            "n",
            "n_windows",
            F.when(
                (F.col("n_windows") >= min_windows) & (F.col("__sd") > 0),
                F.round((F.col("n") - F.col("__mean")) / F.col("__sd"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


def rate_zscores_dense(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_secs: int = 600,
    min_windows: int = 3,
) -> DataFrame:
    """The silence-aware variant promised by :func:`rate_zscores`: every
    observed key is scored on EVERY window between the stream's first
    and last bucket — windows with no events appear with ``n = 0`` and
    strongly negative ``z`` (an outage reads as anomalous silence, which
    the sparse variant cannot see because absent windows have no row).

    The spine is declarative: a 1-row (first_bucket, last_bucket) frame
    cross-joined onto the distinct-key dim, exploded via a timestamp
    ``sequence`` — keys × windows rows, never proportional to events;
    the observed counts LEFT-join onto it."""
    w = F.lit(window_secs)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / w) * w
    )
    counts = (
        df.select(F.col(key_col).alias("key"), bucket.alias("window_start"))
        .groupBy("key", "window_start")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    bounds = df.agg(
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.min(ts_col)) / w) * w
        ).alias("__lo"),
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.max(ts_col)) / w) * w
        ).alias("__hi"),
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    spine = keys.join(F.broadcast(bounds)).select(
        "key",
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {window_secs} SECONDS"),
            )
        ).alias("window_start"),
    )
    dense = spine.join(counts, ["key", "window_start"], "left").select(
        "key", "window_start", F.coalesce("__n", F.lit(0)).alias("n")
    )
    base = dense.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.avg("n").alias("__mean"),
        F.stddev_pop("n").alias("__sd"),
    )
    return (
        dense.join(F.broadcast(base), "key")
        .select(
            "key",
            "window_start",
            "n",
            "n_windows",
            F.when(
                (F.col("n_windows") >= min_windows) & (F.col("__sd") > 0),
                F.round((F.col("n") - F.col("__mean")) / F.col("__sd"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


def seasonal_zscores(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_secs: int = 3600,
    min_periods: int = 3,
) -> DataFrame:
    """Seasonality-aware rate anomaly: each (key, window) count is
    z-scored against the mean/std of the SAME time-of-day slot across
    all days — so a nightly batch spike at 03:00 is normal while the
    same volume at 14:00 alarms, which the flat baseline of
    :func:`rate_zscores` cannot distinguish. ``window_secs`` must divide
    86400 (slots repeat daily).

    Plan: one map-side-combined (key, window) count; the seasonal
    baseline aggregates the count dim by (key, slot) — ≤ keys ×
    (86400/window_secs) rows — and broadcast-joins back. Degenerate
    slots (fewer than ``min_periods`` days observed, or zero variance)
    score 0."""
    if 86400 % window_secs:
        raise ValueError("window_secs must divide 86400")
    w = F.lit(window_secs)
    epoch = F.floor(F.unix_timestamp(F.col(ts_col)) / w) * w
    counts = (
        df.select(
            F.col(key_col).alias("key"),
            epoch.cast("long").alias("__e"),
        )
        .groupBy("key", "__e")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("slot", (F.col("__e") % 86400).cast("long"))
    )
    base = counts.groupBy("key", "slot").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.avg("n").alias("__mean"),
        F.stddev_pop("n").alias("__sd"),
    )
    return (
        counts.join(F.broadcast(base), ["key", "slot"])
        .select(
            "key",
            F.timestamp_seconds(F.col("__e")).alias("window_start"),
            "slot",
            "n",
            "n_periods",
            F.when(
                (F.col("n_periods") >= min_periods) & (F.col("__sd") > 0),
                F.round((F.col("n") - F.col("__mean")) / F.col("__sd"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


def anomaly_incidents(
    scored: DataFrame,
    threshold: float = 2.0,
    window_secs: int = 600,
    key_col: str = "key",
    ts_col: str = "window_start",
    z_col: str = "z",
) -> DataFrame:
    """Roll consecutive anomalous windows into INCIDENTS — the page a
    human actually receives: per key, maximal runs of adjacent windows
    with ``|z| >= threshold`` become one row with start/end, duration,
    window count, and the peak |z|. The classic gaps-and-islands
    grouping (window_index − run_index is constant within a run).

    Runs on the scored (key, window) dim of :func:`rate_zscores` /
    :func:`rate_zscores_dense` / :func:`seasonal_zscores` — tiny by
    construction — with per-key windows only."""
    from pyspark.sql import Window

    e = (F.unix_timestamp(F.col(ts_col)) / window_secs).cast("long")
    hot = scored.filter(F.abs(F.col(z_col)) >= threshold).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("__ts"),
        e.alias("__w"),
        F.col(z_col).alias("__z"),
    )
    rn = F.row_number().over(Window.partitionBy("key").orderBy("__w"))
    runs = hot.withColumn("__island", F.col("__w") - rn)
    return (
        runs.groupBy("key", "__island")
        .agg(
            F.min("__ts").alias("start"),
            F.max("__ts").alias("end"),
            F.count(F.lit(1)).alias("n_windows"),
            F.round(F.max(F.abs(F.col("__z"))), 4).alias("peak_abs_z"),
        )
        .withColumn(
            "duration_secs",
            (
                F.unix_timestamp("end") - F.unix_timestamp("start")
                + window_secs
            ).cast("long"),
        )
        .drop("__island")
    )


def error_budget_burn(
    df: DataFrame,
    error_cond,
    slo: float = 0.99,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_secs: int = 3600,
) -> DataFrame:
    """SLO error-budget accounting per key: windowed error share, the
    window's budget consumption (error share over the allowance
    ``1 − slo``), and the RUNNING share of the period's total budget
    burned so far — the view that says "at this rate the monthly budget
    is gone by Tuesday". ``error_cond`` is a boolean Column.

    Plan: one map-side-combined (key, window) aggregate counting rows
    and errors; the cumulative sums are per-key ordered windows over the
    tiny count dim. Shares are ROUND(…, 6) on identical expression
    shapes for engine portability."""
    from pyspark.sql import Window

    counts = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.window(ts_col, f"{window_secs} seconds").alias("__w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(error_cond.cast("long")).alias("n_err"),
        )
        .select("key", F.col("__w.start").alias("window_start"), "n", "n_err")
    )
    allowance = 1.0 - slo
    w = Window.partitionBy("key").orderBy("window_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("key")
    return counts.select(
        "key",
        "window_start",
        "n",
        "n_err",
        F.round(F.col("n_err") / F.col("n"), 6).alias("err_share"),
        F.round(F.col("n_err") / F.col("n") / allowance, 6).alias("burn_rate"),
        F.round(
            F.sum("n_err").over(w)
            / (F.sum("n").over(tot) * allowance),
            6,
        ).alias("budget_burned"),
    )


def cardinality_growth(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window_secs: int = 3600,
) -> DataFrame:
    """Tag-cardinality explosion monitor — the observability twin of the
    `tag_cardinality_limit` enforcement transform: per window, the
    EXACT distinct-value count of a tag plus its delta and growth ratio
    vs the previous window, so a deploy that starts emitting per-request
    tag values shows up as a cardinality cliff before the limiter ever
    trips.

    Sparse-window semantics (like the non-dense rate_zscores): only
    windows that contain events emit rows, so after a fully-empty
    window the "previous window" is the previous NON-EMPTY one — a
    cliff to zero and back reads as flat. When silence itself is the
    signal, densify on a window spine first (the rate_zscores_dense
    pattern) before lagging.

    Plan: dedup to (window, value) pairs first (map-side combined — the
    shuffle carries distinct pairs, not events), count per window, then
    lag over the tiny window dim."""
    from pyspark.sql import Window

    pairs = (
        df.select(
            F.window(ts_col, f"{window_secs} seconds")["start"].alias(
                "window_start"
            ),
            F.col(value_col).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .distinct()
    )
    counts = pairs.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    w = Window.orderBy("window_start")
    prev = F.lag("n_distinct").over(w)
    return counts.select(
        "window_start",
        "n_distinct",
        (F.col("n_distinct") - F.coalesce(prev, F.col("n_distinct")))
        .cast("long")
        .alias("delta"),
        F.when(
            prev.isNotNull() & (prev > 0),
            F.round(F.col("n_distinct") / prev, 4),
        )
        .otherwise(F.lit(1.0))
        .alias("growth"),
    )


def first_seen_keys(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window_secs: int = 3600,
) -> DataFrame:
    """New-entity detection: per window, how many values of
    ``value_col`` appear for the FIRST time in the whole stream, plus
    the share of that window's distinct values that are new — new hosts
    after a deploy, new user-agents during an attack, new token sources
    after an ingest change.

    Plan: dedup to (window, value) pairs (map-side combined), find each
    value's first window with a min-aggregate on the pair dim, count
    firsts per window, join back onto per-window distinct counts — every
    stage runs on the pair dim, events are touched once."""
    pairs = (
        df.select(
            F.window(ts_col, f"{window_secs} seconds")["start"].alias(
                "window_start"
            ),
            F.col(value_col).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .distinct()
    )
    firsts = pairs.groupBy("__v").agg(
        F.min("window_start").alias("window_start")
    )
    n_first = firsts.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    n_all = pairs.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    return (
        n_all.join(n_first, "window_start", "left")
        .select(
            "window_start",
            "n_distinct",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.round(
                F.coalesce("n_new", F.lit(0)) / F.col("n_distinct"), 6
            ).alias("new_share"),
        )
    )


def window_retention(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window_secs: int = 3600,
) -> DataFrame:
    """Window-over-window entity retention: of the values active in the
    previous window, what share is active again in this one — the churn
    signal that separates "traffic dropped" from "the SAME clients left"
    (and, inverted, detects session-storms of one-shot entities).

    ``retention`` is NULL when there is no previous-window baseline at
    all (the stream's first window, or a window following total
    silence) and 0.0 only when the previous window genuinely retained
    nothing — consumers can tell "no baseline" from "everyone left".

    Plan: everything runs on the distinct (window, value) pair dim; the
    retained count is a pair-dim self-equi-join on (value, window−1) —
    keys are (value, window) so the join is uniform, never eventful."""
    one = F.expr(f"INTERVAL {window_secs} SECONDS")
    pairs = (
        df.select(
            F.window(ts_col, f"{window_secs} seconds")["start"].alias("ws"),
            F.col(value_col).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .distinct()
    )
    cur = pairs.alias("cur")
    prv = pairs.select((F.col("ws") + one).alias("ws"), "__v").alias("prv")
    retained = (
        cur.join(prv, ["ws", "__v"])
        .groupBy("ws")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    n_all = pairs.groupBy("ws").agg(F.count(F.lit(1)).alias("n_distinct"))
    prev_all = n_all.select(
        (F.col("ws") + one).alias("ws"), F.col("n_distinct").alias("__n_prev")
    )
    return (
        n_all.join(retained, "ws", "left")
        .join(prev_all, "ws", "left")
        .select(
            F.col("ws").alias("window_start"),
            "n_distinct",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.when(
                F.col("__n_prev") > 0,
                F.round(
                    F.coalesce("n_retained", F.lit(0)) / F.col("__n_prev"), 6
                ),
            ).alias("retention"),
        )
    )


def co_spike_pairs(
    scored: DataFrame,
    threshold: float = 2.0,
    min_cooccur: int = 2,
    key_col: str = "key",
    ts_col: str = "window_start",
    z_col: str = "z",
) -> DataFrame:
    """Which keys spike TOGETHER: unordered key pairs ranked by how many
    windows both were anomalous in (``|z| >= threshold``) — shared-cause
    triage (one backend dying makes every dependent service spike in the
    same windows; unrelated noise doesn't repeat).

    Plan: the hot set is the scored dim filtered by threshold (tiny);
    the pair join is a self-equi-join ON THE WINDOW over that hot set,
    bounded by (hot keys per window)² — the gaps-and-islands cousin of
    :func:`anomaly_incidents`, never touching events."""
    hot = scored.filter(F.abs(F.col(z_col)) >= threshold).select(
        F.col(ts_col).alias("__t"), F.col(key_col).alias("__k")
    )
    a, b = hot.alias("a"), hot.alias("b")
    pairs = a.join(b, "__t").filter(F.col("a.__k") < F.col("b.__k"))
    return (
        pairs.groupBy(
            F.col("a.__k").alias("key_a"), F.col("b.__k").alias("key_b")
        )
        .agg(F.count(F.lit(1)).alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= min_cooccur)
    )


def spike_attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window_secs: int = 3600,
    top_k: int = 3,
) -> DataFrame:
    """Which KEY caused the spike: per window, the total event delta vs
    the previous window and the ``top_k`` keys ranked by their own
    delta, with each key's share of the total delta — the triage view
    that turns "traffic doubled at 14:00" into "host-7 doubled it".

    Sparse-window semantics like :func:`cardinality_growth` (documented
    there): "previous" means the previous window in which the key (or
    the stream) had events; densify on a window spine first when
    silence matters.

    Plan: one map-side-combined (window, key) aggregate; the total rides
    a second aggregation of the per-key dim (never re-touching events);
    lags and the per-window rank run on the (window, key) dim
    partitioned by key/window — events cross the wire exactly once."""
    from pyspark.sql import Window

    per_key = (
        df.select(
            F.window(ts_col, f"{window_secs} seconds")["start"].alias("ws"),
            F.col(key_col).alias("key"),
        )
        .groupBy("ws", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_key"))
    )
    wk = Window.partitionBy("key").orderBy("ws")
    keyed = per_key.select(
        "ws",
        "key",
        "n_key",
        (F.col("n_key") - F.coalesce(F.lag("n_key").over(wk), F.lit(0)))
        .cast("long")
        .alias("key_delta"),
    )
    totals = per_key.groupBy("ws").agg(
        F.sum("n_key").cast("long").alias("n_events")
    )
    wt = Window.orderBy("ws")
    totals = totals.select(
        "ws",
        "n_events",
        (
            F.col("n_events")
            - F.coalesce(F.lag("n_events").over(wt), F.lit(0))
        )
        .cast("long")
        .alias("delta"),
    )
    rk = Window.partitionBy("ws").orderBy(
        F.col("key_delta").desc(), F.col("key").asc()
    )
    ranked = keyed.withColumn("rk", F.row_number().over(rk)).filter(
        F.col("rk") <= top_k
    )
    return ranked.join(totals, "ws").select(
        F.col("ws").alias("window_start"),
        "n_events",
        "delta",
        "rk",
        "key",
        "key_delta",
        F.when(
            F.col("delta") != 0,
            # + 0.0 folds IEEE negative zero (0 / negative delta) into
            # +0.0 so reports compare bit-exactly across engines
            F.round(F.col("key_delta") / F.col("delta"), 6) + F.lit(0.0),
        ).alias("delta_share"),
    )
