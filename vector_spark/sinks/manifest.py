"""Checkpointed batch jobs: resume-from-manifest with per-batch lineage and
metrics counters.

Parity: the reference's file-source checkpointer persists a
fingerprint→position map (lib/file-source/src/checkpointer.rs:19-59) so a
restart resumes where it left off; `internal_metrics` exposes pipeline
counters. Batch-Spark equivalent: a 10^12-row job processes its input in
file-granular batches; each completed batch writes ONE marker file (atomic
rename — O(1) per batch, no manifest rewrite) with input fingerprints,
output paths, per-sink row counts and wall time. A restarted job skips
completed batches. Output idempotency comes from per-batch output
subdirectories + overwrite mode — a crashed half-written batch is simply
rewritten (exactly-once at the batch level, strictly stronger than the
reference's at-least-once).

Batch identity is a CONTENT fingerprint of the sorted input-file chunk
(names), mirroring the reference's per-file fingerprint keying
(checkpointer.rs keys state by file fingerprint, not position): if files
are added/removed between runs, file-to-batch membership shifts and the
fingerprints change, so stale completions never silently skip or
double-process files. A marker is honored only when its recorded inputs
equal the currently-planned chunk.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _list_input_files(spark: SparkSession, path: str) -> list[str]:
    # distributed-safe listing via the session's Hadoop FS (works for any
    # scheme the cluster can read: file://, hdfs://, s3a://, ...)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().toString()
        if status.isFile() and not name.rsplit("/", 1)[-1].startswith(("_", ".")):
            out.append(name)
    return sorted(out)


def _chunk_fingerprint(files: list[str]) -> str:
    return hashlib.md5("\n".join(files).encode()).hexdigest()[:12]


@dataclass
class CheckpointedJob:
    """Resumable batch job over a file-backed input table.

    ``pipeline_fn(spark, batch_df) -> dict[sink_name, DataFrame]``; each
    sink frame is written under ``out_dir/<sink>/batch=<id>/``.
    """

    spark: SparkSession
    input_path: str
    out_dir: str
    pipeline_fn: Callable[[SparkSession, DataFrame], dict[str, DataFrame]]
    files_per_batch: int = 8
    job_id: str = "job"

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.out_dir, f"_manifest_{self.job_id}")

    def completed_batches(self) -> dict[str, dict]:
        done = {}
        if os.path.isdir(self.manifest_dir):
            for name in sorted(os.listdir(self.manifest_dir)):
                if not name.endswith(".json"):
                    continue
                with open(os.path.join(self.manifest_dir, name)) as f:
                    rec = json.load(f)
                done[rec["batch_id"]] = rec
        return done

    def _plan_batches(self) -> list[tuple[str, list[str]]]:
        files = _list_input_files(self.spark, self.input_path)
        batches = []
        for i in range(0, len(files), self.files_per_batch):
            chunk = files[i : i + self.files_per_batch]
            # content-fingerprint id: stable iff the chunk's membership is
            # stable; the positional index is kept for human readability only
            bid = f"b{i // self.files_per_batch:05d}-{_chunk_fingerprint(chunk)}"
            batches.append((bid, chunk))
        return batches

    def _write_marker(self, rec: dict) -> None:
        # one marker file per completed batch, atomic rename: O(1) append,
        # crash-safe (a torn write never corrupts other batches' markers)
        os.makedirs(self.manifest_dir, exist_ok=True)
        path = os.path.join(self.manifest_dir, f"{rec['batch_id']}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, path)

    def run(self) -> dict:
        """Process all incomplete batches; returns summary {batches_run,
        batches_skipped, rows: {sink: n}}."""
        os.makedirs(self.out_dir, exist_ok=True)
        done = self.completed_batches()
        ran = skipped = 0
        totals: dict[str, int] = {}
        for batch_id, files in self._plan_batches():
            # skip only when the recorded inputs EQUAL the planned chunk —
            # a fingerprint collision or hand-edited marker with different
            # membership must reprocess, not silently skip
            if batch_id in done and done[batch_id].get("inputs") == files:
                skipped += 1
                for k, v in done[batch_id].get("rows", {}).items():
                    totals[k] = totals.get(k, 0) + v
                continue
            t0 = time.perf_counter()
            batch_df = self.spark.read.parquet(*files)
            outs = self.pipeline_fn(self.spark, batch_df)
            rows: dict[str, int] = {}
            for sink, df in outs.items():
                path = os.path.join(self.out_dir, sink, f"batch={batch_id}")
                df.write.mode("overwrite").parquet(path)
                rows[sink] = self.spark.read.parquet(path).count()
                totals[sink] = totals.get(sink, 0) + rows[sink]
            self._write_marker(
                {
                    "batch_id": batch_id,
                    "job_id": self.job_id,
                    "inputs": files,
                    "rows": rows,
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                }
            )
            ran += 1
        return {"batches_run": ran, "batches_skipped": skipped, "rows": totals}

    def internal_metrics(self) -> DataFrame:
        """Counters as a DataFrame (≙ internal_metrics source): one row per
        (batch, sink) with rows + wall time."""
        recs = []
        for rec in self.completed_batches().values():
            for sink, n in rec.get("rows", {}).items():
                recs.append(
                    (rec["batch_id"], sink, n, rec["wall_sec"], rec["ts"])
                )
        return self.spark.createDataFrame(
            recs, "batch_id string, sink string, rows long, wall_sec double, ts string"
        )
