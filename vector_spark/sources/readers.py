"""Sources: table/file readers with decoding codecs + lineage columns, and
deterministic demo-log generators.

Parity map (SURVEY.md §2.4/§2.6):
- file source + framing/decoders ≙ :func:`read_lines` (newline framing via
  spark.read.text, then a decode codec from vector_spark.functions.parse);
- EventMetadata (source id, ingest info) ≙ :func:`with_lineage` columns
  ``_source_file``, ``_partition_id``, ``_ingest_ts``;
- demo_logs (reference src/sources/demo_logs.rs:105-161 formats
  ApacheCommon/Syslog/Json) ≙ :func:`demo_apache_lines` /
  :func:`demo_syslog_lines` — seed-free deterministic (closed-form in the
  row index, like tables.sequences).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.functions import parse as P

DECODERS = {
    "json": lambda c: P.parse_json_map(c),
    "logfmt": lambda c: P.parse_logfmt(c),
    "syslog": lambda c: P.parse_syslog(c),
    "bsd_syslog": lambda c: P.parse_bsd_syslog(c),
    "apache_common": lambda c: P.parse_common_log_fast(c),
    "bytes": lambda c: c,
}


def with_lineage(df: DataFrame, source_id: str) -> DataFrame:
    """EventMetadata equivalent: provenance columns carried explicitly."""
    return df.select(
        "*",
        F.lit(source_id).alias("_source_id"),
        F.input_file_name().alias("_source_file"),
        F.spark_partition_id().alias("_partition_id"),
        F.current_timestamp().alias("_ingest_ts"),
    )


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None, source_id: str | None = None,
               merge_schema: bool = False) -> DataFrame:
    """``merge_schema=True`` unions the schemas of every file footer
    (spark mergeSchema): the 100 TB reality where a long-lived table's
    older files predate newly added columns — old rows surface the new
    columns as NULL, the exact evolution contract Iceberg formalizes
    (schema-id per snapshot) and plain parquet approximates per-file."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    if merge_schema:
        r = r.option("mergeSchema", "true")
    if fmt == "parquet":
        df = r.parquet(path)
    elif fmt == "csv":
        df = r.option("header", "true").csv(path)
    elif fmt == "json":
        df = r.json(path)
    elif fmt == "orc":
        df = r.orc(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return with_lineage(df, source_id or path) if source_id is not None else df


def read_lines(
    spark: SparkSession,
    path: str,
    decoder: str = "bytes",
    source_id: str | None = None,
) -> DataFrame:
    """Newline-framed text file source + decode codec → columns
    (value=raw line, decoded=struct/map per codec)."""
    if decoder not in DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}; have {sorted(DECODERS)}")
    df = spark.read.text(path)
    out = df.withColumn("decoded", DECODERS[decoder](F.col("value")))
    return with_lineage(out, source_id or path) if source_id is not None else out


def read_lines_charset(
    spark: SparkSession,
    path: str,
    charset: str,
    decoder: str = "bytes",
    source_id: str | None = None,
) -> DataFrame:
    """Non-UTF-8 file source: transcode ``charset`` → UTF-8 then newline-
    frame, the reference's `encoding.charset` file-source option
    (src/encoding_transcode.rs — BOM stripped, lone surrogates replaced).

    Spark's text reader is UTF-8-only, so the file is read as binary and
    transcoded in an Arrow-batched iterator — one python decode per FILE
    (exactly the granularity of the reference's per-reader transcoder),
    then exploded to lines. Files are the unit of parallelism, as with any
    legacy-encoding ingest."""
    if decoder not in DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}; have {sorted(DECODERS)}")
    import pandas as pd  # noqa: F401

    bin_df = spark.read.format("binaryFile").load(path)

    def _transcode(batches):
        for pdf in batches:
            lines = []
            for blob in pdf["content"]:
                text = bytes(blob).decode(charset, errors="replace")
                if text and text[0] == "﻿":  # BOM
                    text = text[1:]
                lines.extend(text.splitlines())
            import pandas as _pd

            yield _pd.DataFrame({"value": lines})

    df = bin_df.select("content").mapInPandas(_transcode, "value string")
    out = df.withColumn("decoded", DECODERS[decoder](F.col("value")))
    return with_lineage(out, source_id or path) if source_id is not None else out


# --- demo log generators (≙ demo_logs source) -------------------------------


def _ts(i: Column) -> Column:
    return F.timestamp_seconds(
        F.unix_timestamp(F.lit("2024-01-01 00:00:00")) + i % 86400
    )


def demo_apache_lines(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic Apache-common lines (value: string)."""
    i = F.col("id")
    return spark.range(n).select(
        F.concat(
            F.lit("10.0."), (i % 256).cast("string"), F.lit("."),
            ((i * 7) % 256).cast("string"),
            F.lit(" - user"), (i % 97).cast("string"),
            F.lit(" ["), F.date_format(_ts(i), "yyyy-MM-dd HH:mm:ss"),
            F.lit('] "GET /page/'), (i % 1000).cast("string"),
            F.lit(' HTTP/1.1" '),
            F.element_at(F.array(F.lit(200), F.lit(200), F.lit(301), F.lit(404), F.lit(500)), (i % 5 + 1).cast("int")).cast("string"),
            F.lit(" "), (100 + i % 9000).cast("string"),
        ).alias("value")
    )


def demo_syslog_lines(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic RFC 5424 syslog lines (value: string)."""
    i = F.col("id")
    pri = (8 + i % 8).cast("string")  # facility=user, severity cycles
    return spark.range(n).select(
        F.concat(
            F.lit("<"), pri, F.lit(">1 "),
            F.date_format(_ts(i), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit(" host-"), (i % 10).cast("string"),
            F.lit(" app-"), (i % 5).cast("string"),
            F.lit(" "), (100 + i % 900).cast("string"),
            F.lit(" MSGID"), (i % 7).cast("string"),
            F.lit(" - message number "), i.cast("string"),
        ).alias("value")
    )
