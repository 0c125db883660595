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
