"""Compression codec functions: encode/decode gzip, zlib, zstd, snappy.

Parity: VRL's encode_gzip/decode_gzip/encode_zlib/decode_zlib/encode_zstd/
decode_zstd/encode_snappy/decode_snappy (website/cue/reference/remap/
functions/encode_gzip.cue et al.) — payload-column (de)compression inside
log pipelines.

gzip/zlib use the Python stdlib inside Arrow-batched pandas UDFs. The
gzip header is built explicitly with MTIME=0 and OS=255 so the encoded
bytes are DETERMINISTIC (the stdlib ``gzip.compress`` stamps wall-clock
mtime, which would break reproducible reruns and retry idempotency).
zstd/snappy have no Python codec in this environment — their builders
raise ``CodecUnavailable`` with the same signature, ready to activate when
``zstandard``/``python-snappy`` are installed (import-gated, documented in
FUNCTIONS.md).
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


class CodecUnavailable(NotImplementedError):
    """The named codec's Python library is not installed in this image."""


def _gzip_bytes(data: bytes, level: int) -> bytes:
    # deterministic gzip member: fixed header (MTIME=0, XFL=0, OS=255)
    co = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = co.compress(data) + co.flush()
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) % 2**32)
    return header + body + trailer


def encode_gzip(col: Column, level: int = 6) -> Column:
    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else _gzip_bytes(v if isinstance(v, bytes) else str(v).encode(), level)
        )

    return _enc(col)


def decode_gzip(col: Column) -> Column:
    @pandas_udf("binary")
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else zlib.decompress(bytes(v), 16 + zlib.MAX_WBITS)
        )

    return _dec(col)


def encode_zlib(col: Column, level: int = 6) -> Column:
    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else zlib.compress(v if isinstance(v, bytes) else str(v).encode(), level)
        )

    return _enc(col)


def decode_zlib(col: Column) -> Column:
    @pandas_udf("binary")
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else zlib.decompress(bytes(v)))

    return _dec(col)


def _unavailable(name: str, pip_name: str):
    def builder(col: Column, *a, **kw) -> Column:
        raise CodecUnavailable(
            f"{name} needs the {pip_name!r} package, not present in this image"
        )

    return builder


try:  # pragma: no cover - not present in this image
    import zstandard as _zstd

    def encode_zstd(col: Column, level: int = 3) -> Column:
        @pandas_udf("binary")
        def _enc(s: pd.Series) -> pd.Series:
            c = _zstd.ZstdCompressor(level=level)
            return s.map(
                lambda v: None
                if v is None
                else c.compress(v if isinstance(v, bytes) else str(v).encode())
            )

        return _enc(col)

    def decode_zstd(col: Column) -> Column:
        @pandas_udf("binary")
        def _dec(s: pd.Series) -> pd.Series:
            d = _zstd.ZstdDecompressor()
            return s.map(lambda v: None if v is None else d.decompress(bytes(v)))

        return _dec(col)

except ImportError:
    encode_zstd = _unavailable("encode_zstd", "zstandard")
    decode_zstd = _unavailable("decode_zstd", "zstandard")

try:  # pragma: no cover - not present in this image
    import snappy as _snappy

    def encode_snappy(col: Column) -> Column:
        @pandas_udf("binary")
        def _enc(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: None
                if v is None
                else _snappy.compress(v if isinstance(v, bytes) else str(v).encode())
            )

        return _enc(col)

    def decode_snappy(col: Column) -> Column:
        @pandas_udf("binary")
        def _dec(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else _snappy.decompress(bytes(v)))

        return _dec(col)

except ImportError:
    encode_snappy = _unavailable("encode_snappy", "python-snappy")
    decode_snappy = _unavailable("decode_snappy", "python-snappy")
