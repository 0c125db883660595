"""Sinks: partitioned/templated writers (≙ reference file sink path
templates + partitioned batching, src/sinks/util/partitioner.rs and
src/sinks/file/mod.rs:49-58).

Spark's committer gives exactly-once file output — strictly stronger than
the reference's at-least-once acks (SURVEY.md §1.4); batching/retry/ARC
machinery is NOT rebuilt (the task scheduler owns it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Partitioned columnar write. ``partition_by`` ≙ the reference's
    templated path partitioning (``/logs/{route}/...``)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    getattr(w, fmt)(path)


def write_routes(
    routed: DataFrame,
    base_path: str,
    route_col: str = "route",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """One labeled frame → per-route subdirectories in a SINGLE pass
    (hive-style ``route=<name>/`` partitions — each sink's rows land in its
    own directory without re-evaluating the upstream per sink)."""
    write_sink(routed, base_path, fmt=fmt, mode=mode, partition_by=[route_col])


def blackhole(df: DataFrame) -> int:
    """Benchmark sink (≙ reference blackhole): full evaluation, no output."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def console(df: DataFrame, n: int = 20) -> None:
    df.show(n, truncate=False)
