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
