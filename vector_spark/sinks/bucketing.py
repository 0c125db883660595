"""Storage-level bucketing: shuffle-free co-located joins.

The reference engine has no storage layout surface — every sink writes a
byte stream (reference `src/sinks/` fan-out, e.g. `src/sinks/file/mod.rs`)
— but at the 10^12-sequence tier the dominant pipeline cost is the
shuffle that a join/aggregate induces on the fact table. Spark's answer
is a WRITE-TIME contract: `bucketBy(n, key)` hash-partitions rows into a
fixed number of buckets per file-write and records the layout in the
catalog; a later join of two tables bucketed on the same key with the
same bucket count starts from matching hash distributions, so the
planner drops BOTH Exchange nodes (and with `sortBy` + one file per
bucket, the merge-sort too). The 100 TB playbook:

- bucket the big token table ONCE on the join key it is repeatedly
  joined/aggregated on (`doc_id` or `source`) when it lands;
- every downstream enrich/route/aggregate run then reads it
  pre-distributed — the shuffle is paid once at ingest, not per query;
- bucket count sizes task parallelism for every consumer (pick ≥ the
  cluster's total cores at the target tier; it need not match
  `spark.sql.shuffle.partitions`).

Correctness does NOT depend on bucketing — the same join produces the
same rows with or without it — so the gate query's oracle is the plain
join SQL; what bucketing changes (the plan) is pinned by
`tests/test_bucketing.py` asserting zero `Exchange hashpartitioning`
nodes in the bucketed join and ≥1 in the unbucketed control.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog parquet table bucketed (and by default
    sorted) on ``key``. One shuffle now buys shuffle-free joins and
    aggregations on ``key`` for every later reader."""
    keys = [key] if isinstance(key, str) else list(key)
    if mode == "overwrite":
        # a managed-table location can outlive its catalog entry (e.g. a
        # previous session died after write, catalog was in-memory);
        # saveAsTable refuses to reuse it — drop both explicitly.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), table.lower())
        shutil.rmtree(loc, ignore_errors=True)
    # repartition on the bucket key first so each task writes whole
    # buckets — without this every task writes a file per bucket it
    # happens to hold (task_count × n_buckets small files at scale).
    w = (
        df.repartition(n_buckets, *keys)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count catalog tables. The merge
    hint steers the planner away from broadcasting the smaller side so
    the co-located sort-merge path (no Exchange on either side) is
    taken — at real scale both sides are too big to broadcast anyway."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table).hint("merge")
    return lt.join(rt, on=on, how=how)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count hash-partitioning Exchange nodes in the executed plan —
    the machine-checkable definition of 'this join did not shuffle'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
