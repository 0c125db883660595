"""community_id (public Corelight spec vectors) + compression codecs."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import compression as C
from vector_spark.functions.network import community_id, community_id_packed


def test_community_id_spec_vector(spark):
    # baseline vector from the public community-id-spec repo
    df = spark.createDataFrame(
        [
            ("128.232.110.120", "66.35.250.204", 34855, 80),
            ("66.35.250.204", "128.232.110.120", 80, 34855),  # reversed flow
        ],
        "sa string, da string, sp int, dp int",
    )
    out = df.select(
        community_id(F.col("sa"), F.col("da"), F.col("sp"), F.col("dp"), "tcp").alias("cid"),
        F.lower(F.hex(community_id_packed(
            F.col("sa"), F.col("da"), F.col("sp"), F.col("dp"), 6
        ))).alias("packed"),
    ).collect()
    assert out[0].cid == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    assert out[1].cid == out[0].cid  # direction-invariant
    assert out[0].packed == "00004223facc80e86e78060000508827"
    assert out[1].packed == out[0].packed


def test_community_id_udp(spark):
    df = spark.createDataFrame(
        [("192.168.1.52", "8.8.8.8", 54585, 53)], "sa string, da string, sp int, dp int"
    )
    r = df.select(
        community_id(F.col("sa"), F.col("da"), F.col("sp"), F.col("dp"), "udp").alias("cid")
    ).collect()[0]
    assert r.cid == "1:d/FP5EW3wiY1vCndhwleRRKHowQ="


def test_gzip_zlib_roundtrip(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog " * 20,), (None,), ("",)],
        "t string",
    )
    enc = df.select(
        "t",
        C.encode_gzip(F.col("t")).alias("gz"),
        C.encode_zlib(F.col("t")).alias("zl"),
    )
    dec = enc.select(
        "t",
        C.decode_gzip(F.col("gz")).cast("string").alias("gz_back"),
        C.decode_zlib(F.col("zl")).cast("string").alias("zl_back"),
        F.length("gz").alias("gz_len"),
        F.length("t").alias("t_len"),
        F.hex(F.substring("gz", 1, 3)).alias("gz_magic"),
        F.hex(F.substring("zl", 1, 2)).alias("zl_magic"),
    ).collect()
    big = next(r for r in dec if r.t and len(r.t) > 100)
    assert big.gz_back == big.t and big.zl_back == big.t
    assert big.gz_len < big.t_len  # actually compresses
    assert big.gz_magic == "1F8B08"  # gzip magic + deflate method
    assert big.zl_magic == "789C"  # zlib level-6 header
    nul = next(r for r in dec if r.t is None)
    assert nul.gz_back is None and nul.zl_back is None


def test_gzip_bytes_deterministic_header():
    # MTIME must be zeroed — two encodings at different wall-clock times
    # are byte-identical (reproducible reruns / retry idempotency)
    a = C._gzip_bytes(b"payload", 6)
    b = C._gzip_bytes(b"payload", 6)
    assert a == b
    assert a[4:8] == b"\x00\x00\x00\x00"  # MTIME
    assert a[9:10] == b"\xff"  # OS = unknown
    assert zlib.decompress(a, 16 + zlib.MAX_WBITS) == b"payload"
    # interoperable: stdlib gzip module reads it
    import gzip as _g

    assert _g.decompress(a) == b"payload"


def test_zstd_snappy_gated():
    with pytest.raises(C.CodecUnavailable):
        C.encode_zstd(F.lit("x"))
    with pytest.raises(C.CodecUnavailable):
        C.decode_snappy(F.lit("x"))


def test_ip6_expand_hex(spark):
    from vector_spark.functions.ip import ip6_expand_hex

    import ipaddress

    cases = [
        "2001:db8::1",
        "::1",
        "::",
        "fe80::dead:beef",
        "::ffff:192.168.1.1",
        "2001:0db8:0000:0000:0000:ff00:0042:8329",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "a string")
    got = {
        r.a: r.h
        for r in df.select("a", ip6_expand_hex(F.col("a")).alias("h")).collect()
    }
    for c in cases:
        want = ipaddress.ip_address(c).exploded.replace(":", "")
        assert got[c] == want, (c, got[c], want)
    # non-v6 garbage → NULL
    bad = spark.createDataFrame([("1:2:3",), ("xyz::1t",)], "a string")
    assert all(
        r.h is None
        for r in bad.select(ip6_expand_hex(F.col("a")).alias("h")).collect()
    )


def test_community_id_ipv6(spark):
    """v6 flows cross-checked against an independent implementation
    (stdlib ipaddress packing + hashlib sha1 per the public spec)."""
    import base64
    import hashlib
    import ipaddress
    import struct

    def ref_cid(sa, da, sp, dp, proto):
        pa, pb = ipaddress.ip_address(sa).packed, ipaddress.ip_address(da).packed
        if (pa, struct.pack("!H", sp)) > (pb, struct.pack("!H", dp)):
            pa, pb, sp, dp = pb, pa, dp, sp
        payload = (
            struct.pack("!H", 0) + pa + pb
            + struct.pack("!BB", proto, 0)
            + struct.pack("!H", sp) + struct.pack("!H", dp)
        )
        return "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()

    flows = [
        ("2001:db8::1", "2001:db8::2", 1024, 80, 6),
        ("2001:db8::2", "2001:db8::1", 80, 1024, 6),  # reversed
        ("fe80::1", "2001:470:e5bf::2", 53333, 53, 17),
    ]
    df = spark.createDataFrame(
        flows, "sa string, da string, sp int, dp int, proto int"
    )
    got = df.select(
        "sa", "sp",
        community_id(
            F.col("sa"), F.col("da"), F.col("sp"), F.col("dp"), F.col("proto")
        ).alias("cid"),
    ).collect()
    for (sa, da, sp, dp, proto), r in zip(flows, got):
        assert r.cid == ref_cid(sa, da, sp, dp, proto), (sa, da)
    assert got[0].cid == got[1].cid  # direction-invariant for v6 too
