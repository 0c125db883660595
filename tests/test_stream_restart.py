"""Crash-shaped exactly-once evidence for the streaming upsert sink.

The in-gate proof (``stream_upsert_sink``) replays a micro-batch in
process; this test covers the other half of the exactly-once story: a
REAL StreamingQuery is killed mid-stream — after the idempotent sink has
applied a batch but before the checkpoint commit for it lands — and a
fresh query restarted from the same checkpoint directory must replay the
uncommitted batch, converge (not double-apply), finish the remaining
input, and leave the table equal to the batch latest-state oracle.

That is precisely the failure mode checkpoint + idempotent-sink delivery
exists for (reference request-retry + sink-side dedup-id contract,
src/sinks/ delivery docs): offsets are WAL-ed before the batch runs, so
a crash between sink write and commit causes a replay on restart.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from vector_spark.sinks.upsert import upsert_partitioned

N_KEYS = 50
WAVES = 3


def _updates(spark):
    # 3 waves x 50 keys; version strictly increases across waves so the
    # batch oracle is "max version per key"
    return spark.range(N_KEYS * WAVES).select(
        (F.col("id") % N_KEYS).alias("ukey"),
        ((F.col("id") % N_KEYS) % 5).alias("part"),
        F.col("id").cast("long").alias("version"),
        F.concat(F.lit("s-"), F.col("id").cast("string")).alias("state"),
    )


def _merge_into(spark, tgt):
    def _merge(batch_df, batch_id):
        win = batch_df.groupBy("ukey", "part").agg(
            F.max("version").alias("version")
        )
        compact = batch_df.join(
            win, ["ukey", "part", "version"]
        ).dropDuplicates(["ukey"])
        upsert_partitioned(
            spark, tgt, compact, key="ukey",
            version_col="version", partition_col="part",
        )

    return _merge


def _run_crash_scenario(spark, tmp_path, crash_fn):
    """Shared harness: 3 one-file waves -> 3 micro-batches, a foreachBatch
    sink whose armed half is ``crash_fn(batch_df, batch_id, merge)`` (it
    decides how much of the batch to apply before dying), a restart from
    the same checkpoint with the crash disarmed, and the batch
    latest-state oracle as the convergence bar."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ck = str(tmp_path / "ck")
    updates = _updates(spark)
    # one file per wave -> maxFilesPerTrigger=1 gives one batch per wave
    for w in range(WAVES):
        updates.filter(
            (F.col("version") >= w * N_KEYS)
            & (F.col("version") < (w + 1) * N_KEYS)
        ).coalesce(1).write.mode("append").parquet(src)
    # seed target (version -1 loses to every real row)
    spark.createDataFrame(
        [(0, 0, -1, "seed")],
        "ukey bigint, part bigint, version long, state string",
    ).write.mode("overwrite").partitionBy("part").parquet(tgt)

    merge = _merge_into(spark, tgt)
    crash = {"armed": True}

    def merge_with_crash(batch_df, batch_id):
        if crash["armed"]:
            crash_fn(batch_df, batch_id, merge)
        else:
            merge(batch_df, batch_id)

    sdf = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.option("checkpointLocation", ck)
        .foreachBatch(merge_with_crash)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.processAllAvailable()
        q.awaitTermination()
    assert q.exception() is not None  # the query really died mid-stream

    # restart from the SAME checkpoint: the crashed batch (offsets
    # WAL-ed, commit missing, sink fully or partially applied) must be
    # replayed and converge
    crash["armed"] = False
    q2 = (
        sdf.writeStream.option("checkpointLocation", ck)
        .foreachBatch(merge_with_crash)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()

    got = {
        r.ukey: (r.version, r.state)
        for r in spark.read.parquet(tgt).collect()
    }
    want = {
        r.ukey: (r.version, r.state)
        for r in _updates(spark)
        .groupBy("ukey")
        .agg(
            F.max("version").alias("version"),
            F.max_by("state", "version").alias("state"),
        )
        .collect()
    }
    assert got == want  # exactly-once: equal to the batch oracle
    assert len(got) == N_KEYS  # seed gone, no duplicate keys


@pytest.mark.parametrize("crash_batch", range(WAVES))
def test_stream_upsert_survives_crash_at_every_batch(
    spark, tmp_path, crash_batch
):
    """Kill the query after the sink applied batch ``crash_batch`` but
    before its checkpoint commit lands — for EVERY batch position, not
    just the worst-ordered middle one: first batch (no prior commits),
    middle, and final batch (nothing left to deliver after replay)."""

    def crash_fn(batch_df, batch_id, merge):
        merge(batch_df, batch_id)
        if batch_id == crash_batch:
            raise RuntimeError("injected crash after sink write")

    _run_crash_scenario(spark, tmp_path, crash_fn)


def test_stream_upsert_survives_partial_partition_write_crash(
    spark, tmp_path
):
    """Kill the query mid-upsert: batch 1's merge has replaced SOME of
    the partitions it touches (dynamic partition overwrite applies
    per-partition) when the exception propagates, leaving genuinely
    partial sink output plus a missing checkpoint commit. The replay
    re-applies the whole batch over the half-written table and must
    still converge to the batch oracle."""

    def crash_fn(batch_df, batch_id, merge):
        if batch_id != 1:
            merge(batch_df, batch_id)
            return
        # apply only partitions {0, 1} of the batch, then die — the
        # on-disk state a crash between two partition replacements leaves
        merge(batch_df.filter(F.col("part").isin([0, 1])), batch_id)
        raise RuntimeError("injected crash mid-partition-write")

    _run_crash_scenario(spark, tmp_path, crash_fn)


def test_restart_without_crash_is_noop_replay(spark, tmp_path):
    """A clean stop + restart from the checkpoint re-delivers nothing:
    all commits landed, so the restarted query starts past the data and
    the table is byte-identical."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ck = str(tmp_path / "ck")
    updates = _updates(spark)
    updates.coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(0, 0, -1, "seed")],
        "ukey bigint, part bigint, version long, state string",
    ).write.mode("overwrite").partitionBy("part").parquet(tgt)

    merge = _merge_into(spark, tgt)
    sdf = spark.readStream.schema(updates.schema).parquet(src)
    q = (
        sdf.writeStream.option("checkpointLocation", ck)
        .foreachBatch(merge)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    before = sorted(
        (r.ukey, r.version, r.state)
        for r in spark.read.parquet(tgt).collect()
    )

    seen = []

    def record(batch_df, batch_id):
        seen.append(batch_id)
        merge(batch_df, batch_id)

    q2 = (
        sdf.writeStream.option("checkpointLocation", ck)
        .foreachBatch(record)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    after = sorted(
        (r.ukey, r.version, r.state)
        for r in spark.read.parquet(tgt).collect()
    )
    assert seen == []  # nothing re-delivered
    assert after == before
