"""spark-submit entry point for the flagship pipeline (north-rule run mode).

Cluster:
    cd /root/repo && zip -r /tmp/vector_spark.zip vector_spark
    spark-submit --py-files /tmp/vector_spark.zip \
        --conf spark.sql.files.maxPartitionBytes=128m \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        jobs/run_pipeline.py \
        --input <iceberg/parquet path> --out <dir> [--resume]

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="input sequences table (parquet dir)")
    ap.add_argument("--synthesize", type=int, help="generate N rows instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true",
                    help="checkpointed batch mode (manifest resume)")
    ap.add_argument("--files-per-batch", type=int, default=64)
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
        out = pipeline.run_pipeline(seq, dim)
        write_routes(out["routed"], os.path.join(args.out, "routed"))
        write_sink(out["agg"], os.path.join(args.out, "agg"))
        print(json.dumps({"routed": os.path.join(args.out, "routed"),
                          "agg": os.path.join(args.out, "agg")}))
    spark.stop()


if __name__ == "__main__":
    main()
