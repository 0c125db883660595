"""spark-submit entry point for the flagship pipeline (north-rule run mode).

Cluster:
    cd /root/repo && zip -r /tmp/vector_spark.zip vector_spark
    spark-submit --py-files /tmp/vector_spark.zip \
        --driver-memory 24g --driver-java-options -XX:+UseParallelGC \
        --conf spark.sql.files.maxPartitionBytes=128m \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        jobs/run_pipeline.py \
        --input <iceberg/parquet path> --out <dir> [--resume]

    Driver memory MUST be on the command line: session.py's builder-set
    spark.driver.memory only binds when this process forks the JVM; under
    spark-submit the JVM is already up at 1g and the 8M-row flagship OOMs
    in the parquet vectored reader (local mode holds every executor
    thread's column batches in the driver heap).

Local smoke:
    python jobs/run_pipeline.py --synthesize 1000000 --out /tmp/vs_out

Writes routed rows (token arrays intact) partitioned by route, the per-sink
windowed aggregates, and — with ``--resume`` — runs as a checkpointed batch
job that skips completed batches on restart (manifest + per-batch metrics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="input sequences table (parquet dir)")
    ap.add_argument("--synthesize", type=int, help="generate N rows instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true",
                    help="checkpointed batch mode (manifest resume)")
    ap.add_argument("--files-per-batch", type=int, default=64)
    ap.add_argument("--noop-sink", action="store_true",
                    help="blackhole both sinks (throughput measurement: "
                         "isolates scan+compute from output-commit IO)")
    ap.add_argument("--parse", choices=["jvm", "arrow"], default="jvm",
                    help="parse stage strategy (jvm regexp fast path, or "
                         "the Arrow-batched pandas-UDF grok variant — "
                         "heavier per row, useful as a CPU-bound scaling "
                         "probe)")
    ap.add_argument("--iters", type=int, default=1,
                    help="evaluate the pipeline N times and report each "
                         "pass's wall seconds (steady-state = min: later "
                         "passes run on a JIT-warm JVM, the regime a "
                         "long-lived cluster job is in after its first "
                         "minutes)")
    args = ap.parse_args()
    if not args.input and not args.synthesize:
        ap.error("need --input or --synthesize")

    from vector_spark import pipeline, tables
    from vector_spark.session import get_spark
    from vector_spark.sinks.writers import write_routes, write_sink

    spark = get_spark("vector_spark_pipeline")
    dim = tables.enrich_sources(spark)

    if args.resume:
        if not args.input:
            ap.error("--resume requires --input")
        from vector_spark.sinks.manifest import CheckpointedJob

        def pipe(s, batch_df):
            out = pipeline.run_pipeline(batch_df, dim)
            return {"routed": out["routed"], "agg": out["agg"]}

        job = CheckpointedJob(
            spark, args.input, args.out, pipe,
            files_per_batch=args.files_per_batch, job_id="flagship",
        )
        summary = job.run()
        print(json.dumps(summary))
    else:
        seq = (
            spark.read.parquet(args.input)
            if args.input
            else tables.sequences(spark, args.synthesize)
        )
        out = pipeline.run_pipeline(seq, dim, parse=args.parse)
        iters: list[float] = []
        for _ in range(max(1, args.iters)):
            t0 = time.perf_counter()
            if args.noop_sink:
                from vector_spark.sinks.writers import blackhole

                blackhole(out["routed"])
                blackhole(out["agg"])
            else:
                write_routes(out["routed"], os.path.join(args.out, "routed"))
                write_sink(out["agg"], os.path.join(args.out, "agg"))
            iters.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "routed": "noop" if args.noop_sink
            else os.path.join(args.out, "routed"),
            "agg": "noop" if args.noop_sink
            else os.path.join(args.out, "agg"),
            "iters_sec": iters, "steady_sec": min(iters),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
