"""Framing codecs: how a byte stream becomes discrete events.

Parity: lib/codecs/src/decoding/framing/ — ``newline_delimited`` (default,
sources/readers.read_lines), ``character_delimited``,
``length_delimited``, ``octet_counting`` (RFC 6587 syslog). ``bytes`` =
whole-payload-as-one-event (binaryFile). ``chunked_gelf`` is scoped out
(UDP chunk reassembly has no file analog).

The parallel unit is the FILE (one reference stream ≙ one file): framing
within a file is inherently sequential byte walking, done once per file
inside an Arrow-batched ``mapInPandas`` over ``binaryFile`` rows; across
files it scales embarrassingly. Frame payloads are emitted with their
ordinal so downstream order is reconstructible.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAME_SCHEMA = "path string, frame_idx long, value binary"


def frame_newline(spark: SparkSession, path: str) -> DataFrame:
    """newline_delimited (the default) — native distributed line reader."""
    return spark.read.text(path)


def frame_character_delimited(
    spark: SparkSession, path: str, delimiter: str
) -> DataFrame:
    """character_delimited — Spark's text reader takes an arbitrary
    ``lineSep``, so this stays fully native (splittable, pushdown-friendly)."""
    return spark.read.option("lineSep", delimiter).text(path)


def _map_files(df: DataFrame, split_fn) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, frame in enumerate(split_fn(bytes(content))):
                    out.append((path, i, frame))
            if out:
                yield pd.DataFrame(out, columns=["path", "frame_idx", "value"])

    return df.mapInPandas(run, FRAME_SCHEMA)


def frame_length_delimited(spark: SparkSession, path: str) -> DataFrame:
    """length_delimited — 4-byte big-endian length prefix per frame (the
    tokio LengthDelimitedCodec default the reference uses)."""

    def split(buf: bytes):
        pos = 0
        while pos + 4 <= len(buf):
            (n,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            if pos + n > len(buf):
                raise ValueError(
                    f"truncated length-delimited frame at offset {pos - 4}"
                )
            yield buf[pos : pos + n]
            pos += n

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _map_files(files, split)


def frame_octet_counting(spark: SparkSession, path: str) -> DataFrame:
    """octet_counting — RFC 6587 syslog framing: ``<LEN><SP><LEN bytes>``
    repeated; frames may contain newlines (why newline framing can't)."""

    def split(buf: bytes):
        pos = 0
        while pos < len(buf):
            sp = buf.index(b" ", pos)
            n = int(buf[pos:sp])
            start = sp + 1
            if start + n > len(buf):
                raise ValueError(f"truncated octet-counted frame at {pos}")
            yield buf[start : start + n]
            pos = start + n

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _map_files(files, split)


# ---------------------------------------------------------------------------
# chunked GELF (UDP) reassembly
# ---------------------------------------------------------------------------

GELF_MAGIC = bytes([0x1E, 0x0F])
GELF_MAX_TOTAL_CHUNKS = 128


def reassemble_chunked_gelf(
    df: DataFrame,
    payload_col: str = "payload",
    decompress: str = "auto",
) -> DataFrame:
    """Chunked-GELF framing (reference lib/codecs/src/decoding/framing/
    chunked_gelf.rs): datagrams starting with the 0x1E0F magic carry a
    header of ``u64 BE message_id, u8 sequence_number, u8 total_chunks
    (1..=128)`` followed by a payload slice; a message completes when all
    ``total_chunks`` distinct sequence numbers arrive and its body is the
    seq-ordered concatenation (:320-420). Non-magic datagrams are whole
    messages. Decompression is sniffed from the body's magic bytes (gzip
    1F8B / zlib 0x78, :88-118) unless ``decompress`` pins a method.

    Spark-first: header math, grouping, completeness checks and the
    binary concatenation are all JVM column expressions (binary substr +
    ``F.aggregate`` concat over the seq-sorted chunk array); only the
    optional gzip/zlib inflate rides the Arrow-batched compression UDFs.
    Incomplete messages surface with ``complete = false`` (the batch
    analog of the reference's timeout-and-drop — callers filter), invalid
    total_chunks values are rejected rows, not crashes.

    Returns one row per message: ``message_id (hex string or null for
    unchunked), n_chunks, total_chunks, complete, body (binary)``.
    """
    p = F.col(payload_col)
    is_chunked = (F.length(p) >= 12) & (
        p.substr(F.lit(1), F.lit(2)) == F.lit(GELF_MAGIC)
    )
    byte = lambda pos: F.conv(F.hex(p.substr(F.lit(pos), F.lit(1))), 16, 10).cast("int")  # noqa: E731
    parsed = df.select(
        F.when(is_chunked, F.hex(p.substr(F.lit(3), F.lit(8))))
        .alias("message_id"),
        F.when(is_chunked, byte(11)).alias("seq"),
        F.when(is_chunked, byte(12)).alias("total_chunks"),
        F.when(is_chunked, p.substr(F.lit(13), F.length(p) - 12))
        .otherwise(p).alias("chunk"),
    ).filter(
        F.col("message_id").isNull()
        | ((F.col("total_chunks") >= 1)
           & (F.col("total_chunks") <= GELF_MAX_TOTAL_CHUNKS)
           & (F.col("seq") < F.col("total_chunks")))
    )
    unchunked = parsed.filter(F.col("message_id").isNull()).select(
        "message_id",
        F.lit(1).alias("n_chunks"), F.lit(1).alias("total_chunks"),
        F.lit(True).alias("complete"), F.col("chunk").alias("body"),
    )
    grouped = (
        parsed.filter(F.col("message_id").isNotNull())
        .groupBy("message_id")
        .agg(
            F.count_distinct("seq").alias("n_chunks"),
            F.max("total_chunks").alias("total_chunks"),
            F.array_sort(F.collect_list(F.struct("seq", "chunk")))
            .alias("_chunks"),
        )
        .select(
            "message_id", "n_chunks", "total_chunks",
            (F.col("n_chunks") == F.col("total_chunks")).alias("complete"),
            F.aggregate(
                F.col("_chunks"),
                F.lit(b""),
                lambda acc, c: F.concat(acc, c["chunk"]),
            ).alias("body"),
        )
    )
    out = unchunked.unionByName(grouped)
    if decompress == "none":
        return out
    from vector_spark.functions.compression import decode_gzip, decode_zlib

    magic = F.hex(F.col("body").substr(F.lit(1), F.lit(2)))
    first = F.hex(F.col("body").substr(F.lit(1), F.lit(1)))
    if decompress == "gzip":
        body = decode_gzip(F.col("body"))
    elif decompress == "zlib":
        body = decode_zlib(F.col("body"))
    else:
        # auto-sniff. Vectorized UDFs evaluate their input column for the
        # whole batch regardless of a surrounding when() — so mask the
        # INPUT per method (None in → None out) and coalesce.
        body = F.coalesce(
            decode_gzip(F.when(magic == "1F8B", F.col("body"))),
            decode_zlib(
                F.when((first == "78") & (magic != "1F8B"), F.col("body"))
            ),
            F.col("body"),
        )
    return out.withColumn("body", F.when(F.col("complete"), body))
