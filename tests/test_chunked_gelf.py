"""Chunked-GELF reassembly (sources/framing.py) vs reference
lib/codecs/src/decoding/framing/chunked_gelf.rs."""

from __future__ import annotations

import gzip
import struct
import zlib

from vector_spark.sources.framing import reassemble_chunked_gelf


def _chunk(mid: int, seq: int, total: int, body: bytes) -> bytes:
    return b"\x1e\x0f" + struct.pack(">BB", 0, 0)[:0] + struct.pack(
        ">QBB", mid, seq, total
    ) + body


def _df(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "payload binary")


def test_reassembly_order_and_unchunked(spark):
    msg = b'{"version":"1.1","short_message":"hello chunked world"}'
    payloads = [
        _chunk(7, 1, 3, msg[20:40]),      # out of order on purpose
        _chunk(7, 0, 3, msg[:20]),
        _chunk(7, 2, 3, msg[40:]),
        b'{"version":"1.1","short_message":"whole"}',  # unchunked
        _chunk(9, 0, 2, b"half"),         # incomplete
    ]
    out = {r.message_id: r
           for r in reassemble_chunked_gelf(_df(spark, payloads)).collect()}
    mid7 = struct.pack(">Q", 7).hex().upper()
    mid9 = struct.pack(">Q", 9).hex().upper()
    assert bytes(out[mid7].body) == msg
    assert out[mid7].complete and out[mid7].n_chunks == 3
    assert out[None].complete and bytes(out[None].body).endswith(b'"whole"}')
    assert not out[mid9].complete and out[mid9].body is None


def test_decompression_sniff(spark):
    msg = b'{"version":"1.1","short_message":"compressed"}'
    payloads = [
        _chunk(1, 0, 1, gzip.compress(msg, mtime=0)),
        _chunk(2, 0, 1, zlib.compress(msg)),
        _chunk(3, 0, 1, msg),
    ]
    out = {r.message_id: bytes(r.body)
           for r in reassemble_chunked_gelf(_df(spark, payloads)).collect()}
    for mid in (1, 2, 3):
        key = struct.pack(">Q", mid).hex().upper()
        assert out[key] == msg, mid


def test_invalid_total_chunks_rejected(spark):
    payloads = [
        _chunk(1, 0, 0, b"zero total"),       # total must be >= 1
        _chunk(2, 5, 3, b"seq past total"),   # seq must be < total
        _chunk(3, 0, 1, b"fine."),
    ]
    out = reassemble_chunked_gelf(_df(spark, payloads),
                                  decompress="none").collect()
    assert len(out) == 1 and bytes(out[0].body) == b"fine."
