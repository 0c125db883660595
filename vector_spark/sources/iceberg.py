"""Iceberg table support, gated on the runtime having the Iceberg Spark
runtime jars (not present in this sandbox image — parquet is the stand-in;
every operator reads DataFrames, so the swap is config-only).

Cluster setup (spark-submit):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop
    --conf spark.sql.catalog.lake.warehouse=<path>

Then ``read_input(spark, "lake.db.sequences")`` scans the Iceberg table
with partition pruning / hidden-partitioning, and
``write_output(df, "lake.db.routed", partition_by=["route"])`` writes with
Iceberg's snapshot isolation (atomic commits, time travel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_input(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read the sequences input: Iceberg table name if the runtime has
    Iceberg and the identifier looks like a catalog table, else parquet."""
    if "/" not in table_or_path and iceberg_available(spark):
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def write_output(
    df: DataFrame,
    table_or_path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    spark = df.sparkSession
    if "/" not in table_or_path and iceberg_available(spark):
        w = df.writeTo(table_or_path)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(table_or_path)
