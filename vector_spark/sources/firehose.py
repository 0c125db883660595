"""AWS Kinesis Firehose HTTP-delivery source decode.

Parity: reference ``src/sources/aws_kinesis_firehose``:

- request body (``models.rs:11-25``, protocol 1.0): camelCase JSON with
  ``requestId``, ``timestamp`` (epoch milliseconds), and ``records``,
  each record a base64 ``data`` payload;
- record decode (``handlers.rs:205-230``): base64 → bytes, then gzip
  per the configured compression — ``auto`` sniffs the 1f 8b magic,
  ``gzip`` always inflates, ``none`` passes through;
- every produced event carries ``request_id`` and the request
  ``timestamp`` (and the caller's ``source_arn``, a request header).

base64/magic-sniffing are JVM expressions; the gzip inflate is the
Arrow-batched pandas UDF from ``functions/compression.py`` and only
runs on records the sniff selects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.functions.compression import decode_gzip

_SCHEMA = (
    "struct<requestId:string,timestamp:long,"
    "records:array<struct<data:string>>>"
)


def parse_firehose_request(
    df: DataFrame,
    body: str | Column = "value",
    compression: str = "auto",
    source_arn: Column | None = None,
) -> DataFrame:
    """One Firehose request body → one row per record: ``message``
    (decoded text), ``request_id``, ``timestamp``, ``source_arn``."""
    if compression not in ("auto", "gzip", "none"):
        raise ValueError(f"unknown compression {compression!r}")
    col = F.col(body) if isinstance(body, str) else body
    req = F.from_json(col, _SCHEMA)
    rec = df.select(
        req["requestId"].alias("request_id"),
        F.timestamp_millis(req["timestamp"]).alias("timestamp"),
        F.explode(req["records"]).alias("__r"),
    ).withColumn("__raw", F.unbase64(F.col("__r.data")))
    raw = F.col("__raw")
    if compression == "none":
        data = raw
    elif compression == "gzip":
        data = decode_gzip(raw)
    else:  # auto: sniff the gzip magic per record (handlers.rs:222-229)
        is_gz = F.hex(F.substring(raw, 1, 2)) == "1F8B"
        # feed the UDF NULL for non-gzip rows — a WHEN around a pandas
        # UDF does not stop it evaluating both branches, and inflating
        # plain bytes would throw
        data = F.coalesce(decode_gzip(F.when(is_gz, raw)), raw)
    out = rec.select(
        data.cast("string").alias("message"),
        "request_id",
        "timestamp",
    )
    if source_arn is not None:
        out = out.withColumn("source_arn", source_arn)
    return out
