"""`exec` source: run a command, ingest its output lines as events
(reference src/sources/exec/mod.rs — scheduled/streaming subprocess with
per-line events carrying host/pid/command/data_stream fields).

Spark mapping: the subprocess runs DRIVER-side (it is an ingress edge,
like the reference's single-process source — parallelism starts at the
pipeline behind it, same posture as the Kafka builders in
streaming/kafka.py), its stdout/stderr are framed into lines, decoded
with the shared codec registry, and parallelized into a DataFrame with
the reference's event fields. The reference's `scheduled` mode maps to
re-running the source per micro-batch; `streaming.respawn_on_exit` is
driver-scheduler machinery deliberately not rebuilt (SURVEY §2.4).
"""

from __future__ import annotations

import socket
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.sources.readers import DECODERS


def read_exec(
    spark: SparkSession,
    command: list[str],
    decoder: str = "bytes",
    include_stderr: bool = True,
    timeout: float | None = 60.0,
    env: dict[str, str] | None = None,
    cwd: str | None = None,
    source_id: str | None = None,
) -> DataFrame:
    """Run ``command`` once and return its output lines as events:
    (value, decoded, data_stream, pid, command, host, _source_id,
    _ingest_ts). Raises on non-zero exit (the reference logs-and-retries;
    a batch source must surface the failure)."""
    if decoder not in DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}; have {sorted(DECODERS)}")
    proc = subprocess.Popen(
        command,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE if include_stderr else subprocess.DEVNULL,
        text=True,
        env=env,
        cwd=cwd,
    )
    out, err = proc.communicate(timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"exec source {command!r} exited {proc.returncode}: {err[:500]}"
        )
    rows = [(line, "stdout") for line in out.splitlines()]
    if include_stderr:
        rows += [(line, "stderr") for line in err.splitlines()]

    df = spark.createDataFrame(rows or [], "value string, data_stream string")
    return (
        df.withColumn("decoded", DECODERS[decoder](F.col("value")))
        .withColumn("pid", F.lit(proc.pid).cast("long"))
        .withColumn("command", F.lit(" ".join(command)))
        .withColumn("host", F.lit(socket.gethostname()))
        .withColumn("_source_id", F.lit(source_id or "exec"))
        .withColumn("_ingest_ts", F.current_timestamp())
    )
