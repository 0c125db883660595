"""postgresql_metrics mapping (sources/postgresql_metrics.py) vs reference
src/sources/postgresql_metrics.rs:600-830."""

from __future__ import annotations

import datetime

from vector_spark.sources import postgresql_metrics as PG


def test_pg_stat_database(spark):
    df = spark.createDataFrame(
        [(16384, "appdb", 3, 100, 5, 50, 5000, 900, 800, 70, 60, 8, 2, 1,
          4096, 0, 1500.0, 250.0,
          datetime.datetime(2023, 11, 14, 22, 13, 20))],
        "datid long, datname string, numbackends int, xact_commit long,"
        " xact_rollback long, blks_read long, blks_hit long,"
        " tup_returned long, tup_fetched long, tup_inserted long,"
        " tup_updated long, tup_deleted long, conflicts long,"
        " temp_files long, temp_bytes long, deadlocks long,"
        " blk_read_time double, blk_write_time double,"
        " stats_reset timestamp",
    )
    rows = PG.pg_stat_database_metrics(df).collect()
    m = {r.name: (r.metric_type, r.value, r.db) for r in rows}
    assert m["pg_stat_database_datid"] == ("gauge", 16384.0, "appdb")
    assert m["pg_stat_database_numbackends"][:2] == ("gauge", 3.0)
    assert m["pg_stat_database_xact_commit_total"][:2] == ("counter", 100.0)
    assert m["pg_stat_database_blk_read_time_seconds_total"][:2] == (
        "counter", 1.5)
    assert m["pg_stat_database_blk_write_time_seconds_total"][1] == 0.25
    assert m["pg_stat_database_stats_reset"][:2] == ("gauge", 1700000000.0)
    # checksum columns absent → skipped schema-statically
    assert "pg_stat_database_checksum_failures_total" not in m
    assert all(r.kind == "absolute" and r.namespace == "postgresql"
               for r in rows)
    assert len(rows) == 18


def test_pg_conflicts_and_bgwriter(spark):
    cf = spark.createDataFrame(
        [("appdb", 1, 2, 3, 4, 5)],
        "datname string, confl_tablespace long, confl_lock long,"
        " confl_snapshot long, confl_bufferpin long, confl_deadlock long",
    )
    m = {r.name: r.value
         for r in PG.pg_stat_database_conflicts_metrics(cf).collect()}
    assert m == {
        "pg_stat_database_conflicts_confl_tablespace_total": 1.0,
        "pg_stat_database_conflicts_confl_lock_total": 2.0,
        "pg_stat_database_conflicts_confl_snapshot_total": 3.0,
        "pg_stat_database_conflicts_confl_bufferpin_total": 4.0,
        "pg_stat_database_conflicts_confl_deadlock_total": 5.0,
    }
    bg = spark.createDataFrame(
        [(10, 2, 3000.0, 500.0, 7, 8, 1, 9, 0, 42)],
        "checkpoints_timed long, checkpoints_req long,"
        " checkpoint_write_time double, checkpoint_sync_time double,"
        " buffers_checkpoint long, buffers_clean long,"
        " maxwritten_clean long, buffers_backend long,"
        " buffers_backend_fsync long, buffers_alloc long",
    )
    rows = PG.pg_stat_bgwriter_metrics(bg).collect()
    m = {r.name: r.value for r in rows}
    assert m["pg_stat_bgwriter_checkpoint_write_time_seconds_total"] == 3.0
    assert m["pg_stat_bgwriter_checkpoint_sync_time_seconds_total"] == 0.5
    assert m["pg_stat_bgwriter_buffers_alloc_total"] == 42.0
    assert "db" not in rows[0].asDict()  # cluster-wide view: no db tag
    assert len(rows) == 10
