"""Kafka source/sink builders (≙ reference src/sources/kafka.rs:98-173 and
src/sinks/kafka/) — Structured Streaming's Kafka connector carries the
at-least-once/exactly-once machinery the reference implements by hand
(offset commit on ack ≙ checkpointed offsets).

The Kafka jars are not in this sandbox image; builders assemble the reader/
writer and decode chain, and fail with a clear message at ``load()`` time
when the connector is absent. On a cluster:
    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.sources.readers import DECODERS


def kafka_source_options(
    brokers: str,
    topics: list[str],
    group_id: str | None = None,
    auto_offset_reset: str = "latest",
) -> dict[str, str]:
    """Option map ≙ the reference's kafka source config surface
    (brokers/topics/group/auto_offset_reset)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topics),
        "startingOffsets": {"latest": "latest", "earliest": "earliest"}[
            auto_offset_reset
        ],
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    return opts


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: list[str],
    decoder: str = "json",
    **kwargs,
) -> DataFrame:
    """Streaming Kafka source + decode codec. Columns: kafka metadata
    (topic/partition/offset/timestamp as lineage) + ``decoded``."""
    if decoder not in DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}")
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topics, **kwargs).items():
        reader = reader.option(k, v)
    raw = reader.load()  # raises here if the kafka connector jar is absent
    return raw.select(
        F.col("topic").alias("_source_topic"),
        F.col("partition").alias("_partition_id"),
        F.col("offset").alias("_offset"),
        F.col("timestamp").alias("_ingest_ts"),
        F.col("value").cast("string").alias("value"),
    ).withColumn("decoded", DECODERS[decoder](F.col("value")))


def write_kafka_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    value_from: str | None = None,
):
    """Streaming Kafka sink: ``value`` = a string column or JSON of all
    columns. Exactly-once within Kafka transactions + checkpoint."""
    value = (
        F.col(value_from).cast("string")
        if value_from
        else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    )
    return (
        df.select(value.alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
