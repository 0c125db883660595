"""postgresql_metrics source — pg_stat_* rows → metric frame.

Parity: reference ``src/sources/postgresql_metrics.rs:600-830``. The
reference polls three statistics views over a live connection; the
engine-shaped analog takes DataFrames WITH THOSE VIEWS' COLUMNS (CDC
dump, foreign-table export, or a JDBC read) and applies the exact
name/kind/scale mapping:

* ``pg_stat_database`` (:615-724): ``datid``/``numbackends`` gauges, the
  12 activity counters (`*_total`), optional checksum columns,
  ``blk_{read,write}_time`` ms→s counters, ``stats_reset`` epoch gauge —
  all tagged ``db`` = datname;
* ``pg_stat_database_conflicts`` (:750-772): the five ``confl_*``
  counters, tagged ``db``;
* ``pg_stat_bgwriter`` (:793-830): checkpoint/buffer counters with the
  two ``*_time`` ms→s conversions and the ``stats_reset`` gauge (no db
  tag — the view is cluster-wide).

Missing columns are skipped schema-statically (older postgres versions),
matching the reference's version-gated reads. Pure column math; the
explode fan-out is the fixed metric list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (column, metric suffix, metric_type, divisor or None=plain,
#  epoch-gauge flag)
_DATABASE = [
    ("datid", "datid", "gauge", None),
    ("numbackends", "numbackends", "gauge", None),
    ("xact_commit", "xact_commit_total", "counter", None),
    ("xact_rollback", "xact_rollback_total", "counter", None),
    ("blks_read", "blks_read_total", "counter", None),
    ("blks_hit", "blks_hit_total", "counter", None),
    ("tup_returned", "tup_returned_total", "counter", None),
    ("tup_fetched", "tup_fetched_total", "counter", None),
    ("tup_inserted", "tup_inserted_total", "counter", None),
    ("tup_updated", "tup_updated_total", "counter", None),
    ("tup_deleted", "tup_deleted_total", "counter", None),
    ("conflicts", "conflicts_total", "counter", None),
    ("temp_files", "temp_files_total", "counter", None),
    ("temp_bytes", "temp_bytes_total", "counter", None),
    ("deadlocks", "deadlocks_total", "counter", None),
    ("checksum_failures", "checksum_failures_total", "counter", None),
    ("blk_read_time", "blk_read_time_seconds_total", "counter", 1000),
    ("blk_write_time", "blk_write_time_seconds_total", "counter", 1000),
]

_CONFLICTS = ["confl_tablespace", "confl_lock", "confl_snapshot",
              "confl_bufferpin", "confl_deadlock"]

_BGWRITER = [
    ("checkpoints_timed", "checkpoints_timed_total", "counter", None),
    ("checkpoints_req", "checkpoints_req_total", "counter", None),
    ("checkpoint_write_time", "checkpoint_write_time_seconds_total",
     "counter", 1000),
    ("checkpoint_sync_time", "checkpoint_sync_time_seconds_total",
     "counter", 1000),
    ("buffers_checkpoint", "buffers_checkpoint_total", "counter", None),
    ("buffers_clean", "buffers_clean_total", "counter", None),
    ("maxwritten_clean", "maxwritten_clean_total", "counter", None),
    ("buffers_backend", "buffers_backend_total", "counter", None),
    ("buffers_backend_fsync", "buffers_backend_fsync_total", "counter",
     None),
    ("buffers_alloc", "buffers_alloc_total", "counter", None),
]


def _emit(df: DataFrame, entries: list[Column], db_tag: bool,
          namespace: str) -> DataFrame:
    arr = F.filter(F.array(*entries), lambda x: x["value"].isNotNull())
    out = df.select("*", F.explode(arr).alias("_m"))
    cols = [
        *[c for c in df.columns],
        F.col("_m.name").alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit("absolute").alias("kind"),
        F.col("_m.metric_type").alias("metric_type"),
        F.col("_m.value").alias("value"),
    ]
    if db_tag:
        cols.insert(len(df.columns) + 4, F.col("datname").alias("db"))
    return out.select(*cols)


def _entry(name: str, mtype: str, value: Column) -> Column:
    return F.struct(
        F.lit(name).alias("name"), F.lit(mtype).alias("metric_type"),
        value.cast("double").alias("value"),
    )


def _mapped(df: DataFrame, prefix: str, spec) -> list[Column]:
    have = set(df.columns)
    entries = []
    for col, suffix, mtype, div in spec:
        if col not in have:
            continue
        v = F.col(col).cast("double")
        if div:
            v = v / div
        entries.append(_entry(f"{prefix}_{suffix}", mtype, v))
    if "stats_reset" in have:
        entries.append(_entry(
            f"{prefix}_stats_reset", "gauge",
            F.unix_seconds(F.col("stats_reset").cast("timestamp")),
        ))
    return entries


def pg_stat_database_metrics(df: DataFrame,
                             namespace: str = "postgresql") -> DataFrame:
    return _emit(df, _mapped(df, "pg_stat_database", _DATABASE),
                 db_tag=True, namespace=namespace)


def pg_stat_database_conflicts_metrics(
    df: DataFrame, namespace: str = "postgresql"
) -> DataFrame:
    have = set(df.columns)
    entries = [
        _entry(f"pg_stat_database_conflicts_{c}_total", "counter",
               F.col(c).cast("double"))
        for c in _CONFLICTS if c in have
    ]
    return _emit(df, entries, db_tag=True, namespace=namespace)


def pg_stat_bgwriter_metrics(df: DataFrame,
                             namespace: str = "postgresql") -> DataFrame:
    return _emit(df, _mapped(df, "pg_stat_bgwriter", _BGWRITER),
                 db_tag=False, namespace=namespace)
