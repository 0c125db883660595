"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container — see ``DecodeUnavailable``); everything Spark-side is real and
tested: the schema contract, Arrow batch shape through ``mapInPandas``,
partition-size control for fat binary rows, and a deterministic fake
decoder so the plumbing has testable output.

Pattern for a real deployment: swap ``_fake_decode`` for PIL/librosa inside
the same ``mapInPandas`` iterator — the batch iterator keeps peak memory at
(arrow batch size × avg blob size), independent of partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("blob", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: media libraries are not present in
    this environment. Use ``fake=True`` for the deterministic stand-in."""


def synth_media(spark, n: int, blob_bytes: int = 256) -> DataFrame:
    """Deterministic synthetic media table (blob = repeated md5 bytes).

    Partition count scales with n (~64 rows/partition) instead of
    inheriting default parallelism: a 300-row demo on local[32] would
    otherwise spin 32 Python workers in extract_features for ~10 rows
    each — worker startup dominating real work."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    i = F.col("id")
    parts = max(1, min(32, n // 64))
    return spark.range(0, n, 1, parts).select(
        F.format_string("m-%08d", i).alias("media_id"),
        F.element_at(kinds, (i % 3 + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (32 + i % 64).cast("int").alias("width"),
        (32 + (i * 7) % 64).cast("int").alias("height"),
        (1000 + i % 9000).alias("duration_ms"),
        F.repeat(F.unhex(F.md5(i.cast("string"))), blob_bytes // 16).cast("binary").alias("blob"),
    )


def _fake_decode(blob: bytes, dim: int) -> list[float]:
    """Deterministic fake feature: md5-chain over the blob → dim floats in
    [-1, 1). Stands in for a real decode+embed so tests are exact."""
    out: list[float] = []
    h = blob or b""
    while len(out) < dim:
        h = hashlib.md5(h).digest()
        for j in range(0, 16, 4):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[j : j + 4], "big")
            out.append((v / 2**31) - 1.0)
    return out


def extract_features(
    media: DataFrame,
    dim: int = 8,
    fake: bool = True,
    batch_label: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow batch iterator).

    ``fake=True`` uses the deterministic stand-in; ``fake=False`` raises
    ``DecodeUnavailable`` (no media libs in this container) — the plumbing
    (schema, batching, partitioning) is identical either way.

    ``partitions``: opt-in repartition for inputs arriving as a few fat
    files (decode is CPU-bound — spread it). Default None: no shuffle;
    a blind same-count repartition would round-robin every blob byte
    through an exchange for zero parallelism gain.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecodeUnavailable(
                    "real media decode needs PIL/librosa/ffmpeg — not in this image"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["blob"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["blob"].map(lambda b: _fake_decode(b, dim)),
                }
            )

    if partitions:
        media = media.repartition(partitions)
    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (the decode of each frame would run in extract_features). Pure column
    math — demonstrates explode-based fan-out for frame-level rows."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("out_w", IntegerType(), True),
        StructField("out_h", IntegerType(), True),
        StructField("out_bytes", LongType(), True),
        StructField("blob", BinaryType(), True),
    ]
)


def _fake_resize(blob: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic stand-in for a real resample: output size is
    3·out_w·out_h bytes (RGB raster) filled from an md5 chain seeded by
    (blob, dims) — byte-exact across executors/retries, so tests can pin
    digests the way they do for _fake_decode."""
    need = 3 * out_w * out_h
    h = hashlib.md5((blob or b"") + f":{out_w}x{out_h}".encode()).digest()
    chunks = [h]
    while sum(len(c) for c in chunks) < need:
        h = hashlib.md5(h).digest()
        chunks.append(h)
    return b"".join(chunks)[:need]


def resize_media(
    media: DataFrame,
    out_w: int,
    out_h: int,
    fake: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Resize/resample images via ``mapInPandas`` — identical plumbing
    contract to ``extract_features``: Arrow batch iterator bounds peak
    memory at (batch size × blob size); ``fake=False`` raises
    ``DecodeUnavailable`` where a real deployment would call
    ``PIL.Image.resize`` inside the same iterator. Aspect-preserving fit
    into the (out_w, out_h) box in PURE INTEGER math (width-bound iff
    out_w·height ≤ out_h·width; the free dimension is a floor division) —
    float scale factors round differently across engines, integer ratios
    don't, so the oracle mirrors this exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecodeUnavailable(
                    "real media resize needs PIL/ffmpeg — not in this image"
                )
            wb = (out_w * pdf["height"]) <= (out_h * pdf["width"])
            w = (
                wb * out_w + ~wb * ((pdf["width"] * out_h) // pdf["height"])
            ).astype("int32")
            hgt = (
                wb * ((pdf["height"] * out_w) // pdf["width"]) + ~wb * out_h
            ).astype("int32")
            blobs = [
                _fake_resize(b, int(ww), int(hh))
                for b, ww, hh in zip(pdf["blob"], w, hgt)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_w": w,
                    "out_h": hgt,
                    "out_bytes": [len(b) for b in blobs],
                    "blob": blobs,
                }
            )

    if partitions:
        media = media.repartition(partitions)
    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZE_SCHEMA)
