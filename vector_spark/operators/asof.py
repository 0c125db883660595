"""As-of join: each left row gets the LATEST right row with
``right.ts <= left.ts`` per key — the most-recent-snapshot lookup every
telemetry/training pipeline needs (rate tables, config versions, model
deployments). Spark has no native as-of join; this is the scale-correct
composition (one shuffle on the key, no range explosion):

union the two sides per key → sort by (ts, right-first) inside the key →
carry the right row forward with ``last(ignorenulls=True)`` over an
unbounded-preceding window → keep left rows. DuckDB's native ``ASOF JOIN``
serves as the bit-exact oracle.

Alternative for few, huge keys: ``applyInPandas`` + ``pd.merge_asof`` per
key (pandas path, used when per-key data fits a worker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "event_ts",
    right_ts_col: str | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join. Right's payload columns (everything except keys and
    its timestamp) are appended to each left row from the latest right row
    at-or-before the left timestamp; null when no right row precedes.

    One shuffle on ``on`` (window partition); both inputs stay distributed.
    The right row travels as ONE struct so nullable payload columns never
    mix values from different right rows.
    """
    rts = right_ts_col or ts_col
    payload = [c for c in right.columns if c not in set(on) | {rts}]
    if not payload:
        raise ValueError("right side has no payload columns")
    lrow_type = (
        "struct<"
        + ",".join(f"`{f.name}`:{f.dataType.simpleString()}" for f in left.schema.fields)
        + ">"
    )
    rrow_type = (
        "struct<"
        + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in payload
        )
        + ">"
    )
    l_marked = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    r_marked = right.select(
        *on,
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("__rrow"),
    )
    unioned = l_marked.unionByName(r_marked)
    # right rows sort BEFORE left rows at equal ts (<= semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__is_left",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__rrow"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        "__lrow.*",
        *[F.col(f"__rrow.{c}").alias(c + suffix) for c in payload],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "event_ts",
    right_ts_col: str | None = None,
) -> DataFrame:
    """Grouped-map variant: ``pd.merge_asof`` per key via ``applyInPandas``
    (cogrouped). Same semantics as :func:`asof_join`; prefer it when keys
    are few but each key's data is large and sorted merges beat the window
    sort. Arrow-batched — no per-row Python."""
    import pandas as pd
    from pyspark.sql.types import StructType

    rts = right_ts_col or ts_col
    payload = [c for c in right.columns if c not in set(on) | {rts}]
    out_schema = StructType(
        list(left.schema.fields)
        + [right.schema[c] for c in payload]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(ts_col, kind="mergesort")
        if r_pdf.empty:
            for c in payload:
                l_sorted[c] = None
            return l_sorted
        r_sorted = r_pdf.sort_values(rts, kind="mergesort")[[rts] + payload]
        merged = pd.merge_asof(
            l_sorted, r_sorted, left_on=ts_col, right_on=rts,
            direction="backward",
        )
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(merge, out_schema)
    )
