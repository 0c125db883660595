"""SparkSession builder tuned for the pipeline.

Defaults follow the scale posture in SURVEY.md §4/§7: AQE on (runtime
re-planning + skew-join splitting), Arrow on (vectorized pandas UDF exchange,
the moral equivalent of the reference's ≤1000-event micro-batches, see
reference src/source_sender/mod.rs:32), shuffle partitions sized to cores for
local mode (cluster deployments override via spark-submit --conf).

Timezone is pinned to UTC so timestamps compare bit-stable against external
oracles (DuckDB is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size ≙ reference EventArray CHUNK_SIZE semantics (micro-batch
# unit for vectorized UDF execution); 10k is a good Arrow sweet spot.
ARROW_BATCH = 10_000


def get_spark(
    app_name: str = "vector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with pipeline-tuned defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster, pass ``master=None`` and let spark-submit decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N]: one shuffle partition per core; cluster: override.
        n = master[len("local[") : -1] if master.startswith("local[") else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: ALL executor threads live in the driver JVM — size it
        # for the whole job (cluster mode overrides via spark-submit).
        # 24g beats 48g here: the flagship allocates several GB of token
        # arrays per pass, and a larger heap just defers collection into
        # multi-second majors mid-query (measured 16-50s/iter at 48g+G1
        # vs a flat 4s/iter at 24g+ParallelGC).
        # NOTE: driver memory/JVM flags set here only take effect when THIS
        # process forks the JVM (python script / pytest). Under spark-submit
        # the driver JVM is already running, so pass --driver-memory 24g and
        # --driver-java-options -XX:+UseParallelGC on the command line
        # (measured: the 8M-row flagship OOMs at spark-submit's 1g default).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Throughput collector for batch work: G1's concurrent cycles
        # were measured spending 26s/iter on young GC in the flagship
        # (allocation-heavy, no latency SLO — the classic ParallelGC
        # case; on a cluster set the same via spark.executor.
        # extraJavaOptions)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        # keep scan tasks ≥ cores at local data sizes (default 128m packs a
        # ~500MB input into ~5 tasks on 32 cores); cluster jobs at 100TB
        # should raise this back to 128m+ via spark-submit --conf
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_MAX_PARTITION_BYTES", "16m"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
