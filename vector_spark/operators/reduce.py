"""reduce — collapse groups of events into one merged event.

Parity: reference src/transforms/reduce/transform.rs:56-376.
- group key = values of ``group_by`` fields (Discriminant,
  lib/vector-core/src/event/discriminant.rs:12-37);
- per-field merge strategies (merge_strategy.rs:15-53):
  ``discard`` (first), ``retain`` (last), ``sum``, ``max``, ``min``,
  ``array`` (collect), ``concat`` (join with space), ``concat_newline``,
  ``concat_raw``, ``shortest_array``, ``longest_array``, ``flat_unique``;
  default: first value for scalars (transform.rs:94-115);
- session close: ``expire_after_ms`` staleness / ``ends_when`` condition /
  ``max_events`` — wall-clock constructs in the reference (SURVEY.md §2.8);
  the batch engine sessionizes on a DATA timestamp via gap-based
  sessionization (lag + cumulative-sum of gap>expire), which is the
  event-time superset of the reference's processing-time behavior.

Scale: one shuffle on (group keys [+ session id]). ``first``/``last`` need a
deterministic order — we order by ``order_by`` inside each group using
max_by/min_by (no per-group sort, no window pass over every row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.conditions import ConditionLike, to_column

MERGE_STRATEGIES = (
    "discard retain sum max min array concat concat_newline concat_raw "
    "shortest_array longest_array flat_unique"
).split()


def _agg_for(field: str, strategy: str, order: str, dtype: str | None = None) -> Column:
    c, o = F.col(field), F.col(order)
    if strategy == "discard":
        return F.min_by(c, o)
    if strategy == "retain":
        return F.max_by(c, o)
    if strategy == "first_non_null":
        # the reference inserts a field the first time it is SEEN
        # (reduce merge_in_event) — order key nulled where the value is
        # null so min_by skips those rows
        return F.min_by(c, F.when(c.isNotNull(), o))
    if strategy == "sum":
        return F.sum(c)
    if strategy == "max":
        return F.max(c)
    if strategy == "min":
        return F.min(c)
    def _ordered_values() -> Column:
        # values in event order, absent (null) entries skipped — the
        # reference only merges fields PRESENT in the incoming event
        return F.filter(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(o.alias("o"), c.alias("v")))
                ),
                lambda s: s["v"],
            ),
            lambda x: x.isNotNull(),
        )

    if strategy == "array":
        return _ordered_values()
    if strategy in ("concat", "concat_newline", "concat_raw"):
        if strategy == "concat" and dtype and dtype.startswith("array"):
            # concat of array-typed fields concatenates the arrays
            # (merge_strategy.rs concat on Value::Array)
            return F.flatten(_ordered_values())
        sep = {"concat": " ", "concat_newline": "\n", "concat_raw": ""}[strategy]
        vals = _ordered_values()
        # a field never seen stays absent (null), not ""
        return F.when(F.size(vals) > 0, F.array_join(vals, sep))
    if strategy == "shortest_array":
        return F.min_by(c, F.size(c))
    if strategy == "longest_array":
        return F.max_by(c, F.size(c))
    if strategy == "flat_unique":
        return F.array_distinct(F.flatten(F.collect_list(c)))
    raise ValueError(f"unknown merge strategy {strategy!r}")


def reduce_events(
    df: DataFrame,
    group_by: list[str],
    merge_strategies: dict[str, str],
    order_by: str,
    expire_after_secs: float | None = None,
    ts_col: str = "event_ts",
    ends_when: ConditionLike | None = None,
    starts_when: ConditionLike | None = None,
    max_events: int | None = None,
    count_col: str | None = "events_count",
    auto_merge: bool = False,
) -> DataFrame:
    """Merge each group into one row; optionally sessionize first.

    ``order_by``: column defining event order within a group (the reference
    uses arrival order; batch needs an explicit data column).
    ``expire_after_secs``: gap-based sessionization — a new session starts
    when the gap since the previous event in the group exceeds this.
    ``ends_when``: a matching event closes the current session (the closer is
    INCLUDED in the closing session, reference transform.rs:258-304).
    ``starts_when``: a matching event OPENS a new session (the opener is the
    first event of the new session — the reference's starts_when flushes the
    running group before processing the matching event).
    ``max_events``: a session additionally splits every ``max_events``
    events (reference config max_events cap).
    """
    keys = list(group_by)
    if (
        expire_after_secs is not None
        or ends_when is not None
        or starts_when is not None
    ):
        w = Window.partitionBy(*keys).orderBy(order_by)
        boundary = F.lit(False)
        if expire_after_secs is not None:
            gap = F.unix_timestamp(F.col(ts_col)) - F.lag(
                F.unix_timestamp(F.col(ts_col))
            ).over(w)
            boundary = boundary | (gap > expire_after_secs)
        if ends_when is not None:
            # previous event ended a session → this row starts a new one
            prev_end = F.lag(to_column(ends_when, df).cast("int"), 1, 0).over(w)
            boundary = boundary | (prev_end == 1)
        if starts_when is not None:
            # the matching event itself opens the new session
            boundary = boundary | to_column(starts_when, df)
        # first row of a group: lag is null → null boundary must read as
        # "no boundary" (null OR x = null in SQL — coalesce explicitly)
        boundary = F.coalesce(boundary, F.lit(False))
        df = df.withColumn(
            "session_id",
            F.sum(boundary.cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        keys = keys + ["session_id"]
    if max_events is not None:
        w_sub = Window.partitionBy(*keys).orderBy(order_by)
        df = df.withColumn(
            "session_sub",
            F.floor((F.row_number().over(w_sub) - 1) / max_events),
        )
        keys = keys + ["session_sub"]
    dts = dict(df.dtypes)
    aggs = [
        _agg_for(f, s, order_by, dts.get(f)).alias(f)
        for f, s in merge_strategies.items()
        if f in df.columns  # a strategy for an absent field is a no-op
    ]
    if auto_merge:
        # reference default strategies (reduce/transform.rs:94-115): fields
        # without an explicit strategy merge by type — numbers add,
        # timestamps keep first + emit <field>_end with the last, anything
        # else keeps the first value SEEN (merge_in_event inserts a missing
        # field when it first appears)
        skip = set(keys) | set(merge_strategies) | {order_by, count_col}
        for f in df.schema.fields:
            if f.name in skip or f.name.startswith("__") or f.name == "session_sub":
                continue
            dt = f.dataType.simpleString()
            if dt in ("int", "bigint", "double", "float", "smallint", "tinyint"):
                aggs.append(_agg_for(f.name, "sum", order_by).alias(f.name))
            elif dt.startswith("timestamp"):
                aggs.append(
                    _agg_for(f.name, "first_non_null", order_by).alias(f.name)
                )
                aggs.append(
                    _agg_for(f.name, "retain", order_by).alias(f"{f.name}_end")
                )
            else:
                aggs.append(
                    _agg_for(f.name, "first_non_null", order_by).alias(f.name)
                )
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    return df.groupBy(*keys).agg(*aggs)
