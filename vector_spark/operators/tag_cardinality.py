"""tag_cardinality_limit — bound the distinct values a metric tag may take.

Parity: reference src/transforms/tag_cardinality_limit/mod.rs — per tag key,
accept at most ``value_limit`` distinct values (default 500, config.rs:84-86);
a value beyond the limit triggers either ``drop_tag`` (null out the tag, keep
the event) or ``drop_event``. Reference tracks first-seen order with a
hashset or Bloom filter (config.rs:34-53); the batch engine computes the
exact first-``value_limit`` set by first-seen order.

Plan shape (scale): build a per-tag dimension of the first N distinct values
— groupBy(tag) → min(first_seen) → rank — then broadcast-join it back.
The dimension is at most ``value_limit`` rows per tag: broadcastable by
construction, so the enforcement join adds NO shuffle to the main stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_cardinality_limit(
    df: DataFrame,
    tag_cols: list[str],
    value_limit: int = 500,
    action: str = "drop_tag",
    order_by: str = "event_ts",
) -> DataFrame:
    if action not in ("drop_tag", "drop_event"):
        raise ValueError("action must be drop_tag or drop_event")
    out = df
    for tag in tag_cols:
        # First-N distinct values by first-seen order via orderBy().limit()
        # — Spark plans TakeOrderedAndProject (distributed per-partition
        # top-N + driver merge of N rows), NOT a single-partition window:
        # this operator exists precisely for tags whose distinct-value count
        # explodes, so a global Window.orderBy choke point would defeat it.
        # Events with a NULL tag pass through un-counted: the reference only
        # limits concrete tag values (tag_cardinality_limit/mod.rs —
        # events lacking the tag are forwarded unchanged).
        allowed = (
            df.filter(F.col(tag).isNotNull())
            .groupBy(tag)
            .agg(F.min(order_by).alias("__first_seen"))
            .orderBy(F.col("__first_seen"), F.col(tag))
            .limit(value_limit)
            .select(F.col(tag).alias("__allowed_val"))
        )
        joined = out.join(
            F.broadcast(allowed),
            on=out[tag] == allowed["__allowed_val"],
            how="left",
        )
        if action == "drop_event":
            out = joined.filter(
                F.col(tag).isNull() | F.col("__allowed_val").isNotNull()
            ).drop("__allowed_val")
        else:
            out = joined.withColumn(
                tag,
                F.when(F.col("__allowed_val").isNotNull(), F.col(tag)),
            ).drop("__allowed_val")
    return out
