"""Streaming flagship: identical stages as batch, event-time agg; streaming
results must match the batch pipeline on the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark import pipeline, tables

SEQ_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, _i long"
)


def test_stream_pipeline_matches_batch(spark, dim, tmp_path):
    n = 2000
    p = str(tmp_path / "seq")
    tables.sequences(spark, n).write.parquet(p)

    # batch reference
    batch = pipeline.run_pipeline(spark.read.parquet(p), dim)
    batch_routed = batch["routed"].groupBy("route").count().collect()
    batch_counts = {r.route: r["count"] for r in batch_routed}

    # streaming run (file source → memory sink)
    stream_in = spark.readStream.schema(SEQ_SCHEMA).parquet(p)
    outs = pipeline.stream_pipeline(stream_in, dim)
    q = (
        outs["routed"]
        .writeStream.format("memory")
        .queryName("sp_routed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.route: r["count"]
        for r in spark.sql("SELECT route, count(*) AS count FROM sp_routed GROUP BY route").collect()
    }
    assert got == batch_counts

    # agg stream: watermark holds back open windows in append mode, so
    # compare only emitted windows against the batch aggregate
    q2 = (
        outs["agg"]
        .writeStream.format("memory")
        .queryName("sp_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    emitted = spark.sql("SELECT * FROM sp_agg").collect()
    batch_agg = {
        (r.route, r.source, r.window_start): (r.events, r.tokens_total)
        for r in batch["agg"].collect()
    }
    assert emitted, "expected at least the watermark-closed windows"
    for r in emitted:
        key = (r.route, r.source, r.window_start)
        assert batch_agg[key] == (r.events, r.tokens_total)
