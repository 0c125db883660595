"""mmdb reader: build a tiny spec-conformant MaxMind-DB fixture byte-by-
byte (encoder below follows the public format spec independently of the
reader's decoder) and check the range-table conversion + enrich join."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from tools.mmdb_to_ranges import MMDBReader, mmdb_to_rows


# --- minimal spec-conformant encoder (test fixture builder) ----------------


def enc_str(s: str) -> bytes:
    b = s.encode()
    assert len(b) < 29
    return bytes([(2 << 5) | len(b)]) + b


def enc_uint(n: int, typ: int = 6) -> bytes:
    body = b"" if n == 0 else n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([(typ << 5) | len(body)]) + body


def enc_uint64(n: int) -> bytes:
    body = b"" if n == 0 else n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([(0 << 5) | len(body), 9 - 7]) + body


def enc_map(d: dict) -> bytes:
    out = bytes([(7 << 5) | len(d)])
    for k, v in d.items():
        out += enc_str(k)
        out += v if isinstance(v, bytes) else enc_str(v)
    return out


def enc_array(items: list[bytes]) -> bytes:
    return bytes([(0 << 5) | len(items), 11 - 7]) + b"".join(items)


def build_mmdb(networks: dict[tuple[int, int], bytes], record_size: int = 24,
               total_bits: int = 32, ip_version: int = 4) -> bytes:
    """networks: {(prefix_int, prefix_len): encoded_data_item}"""
    # 1. data section: concatenate items, remember offsets
    data, offsets = b"", {}
    for key, item in networks.items():
        offsets[key] = len(data)
        data += item
    # 2. build the binary trie
    root: dict = {}
    for (prefix, plen), _ in networks.items():
        node = root
        for i in range(plen):
            bit = (prefix >> (total_bits - 1 - i)) & 1
            if i == plen - 1:
                node[bit] = ("data", (prefix, plen))
            else:
                nxt = node.get(bit)
                if not isinstance(nxt, dict):
                    nxt = {}
                    node[bit] = nxt
                node = nxt
    # 3. number internal nodes (preorder) and serialize
    nodes: list[dict] = []

    def collect(n: dict) -> int:
        idx = len(nodes)
        nodes.append(n)
        for bit in (0, 1):
            c = n.get(bit)
            if isinstance(c, dict):
                n[bit] = ("node", collect(c))
        return idx

    collect(root)
    node_count = len(nodes)
    tree = b""
    for n in nodes:
        recs = []
        for bit in (0, 1):
            c = n.get(bit)
            if c is None:
                recs.append(node_count)  # empty
            elif c[0] == "node":
                recs.append(c[1])
            else:
                recs.append(node_count + 16 + offsets[c[1]])
        assert record_size == 24
        tree += recs[0].to_bytes(3, "big") + recs[1].to_bytes(3, "big")
    meta = enc_map(
        {
            "binary_format_major_version": enc_uint(2, typ=5),
            "binary_format_minor_version": enc_uint(0, typ=5),
            "build_epoch": enc_uint64(1700000000),
            "database_type": enc_str("Test-Country"),
            "description": enc_map({"en": enc_str("tiny fixture")}),
            "ip_version": enc_uint(ip_version, typ=5),
            "languages": enc_array([enc_str("en")]),
            "node_count": enc_uint(node_count, typ=6),
            "record_size": enc_uint(record_size, typ=5),
        }
    )
    return tree + b"\x00" * 16 + data + b"\xab\xcd\xefMaxMind.com" + meta


def ip(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


@pytest.fixture(scope="module")
def mmdb_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mmdb") / "test.mmdb"
    nets = {
        (ip("10.0.0.0"), 8): enc_map(
            {"country": enc_map({"iso_code": enc_str("AA")}),
             "confidence": enc_uint(95, typ=5)}
        ),
        (ip("192.168.0.0"), 16): enc_map(
            {"country": enc_map({"iso_code": enc_str("BB")})}
        ),
        (ip("192.169.0.0"), 24): enc_map(
            {"country": enc_map({"iso_code": enc_str("CC")})}
        ),
    }
    p.write_bytes(build_mmdb(nets))
    return str(p)


def test_reader_metadata_and_networks(mmdb_path):
    r = MMDBReader.open(mmdb_path)
    assert r.metadata["database_type"] == "Test-Country"
    assert r.metadata["ip_version"] == 4
    assert r.metadata["languages"] == ["en"]
    nets = sorted((p, l) for p, l, _ in r.networks())
    assert nets == [
        (ip("10.0.0.0"), 8), (ip("192.168.0.0"), 16), (ip("192.169.0.0"), 24)
    ]


def test_mmdb_to_rows_ranges(mmdb_path):
    rows = mmdb_to_rows(mmdb_path)
    assert [
        (r["ip_lo"], r["ip_hi"], r["country_iso_code"]) for r in rows
    ] == [
        (ip("10.0.0.0"), ip("11.0.0.0"), "AA"),
        (ip("192.168.0.0"), ip("192.169.0.0"), "BB"),
        (ip("192.169.0.0"), ip("192.169.1.0"), "CC"),
    ]
    assert rows[0]["confidence"] == 95  # flattened scalar survives


def test_mmdb_feeds_enrich_ip_range(mmdb_path, spark):
    from vector_spark.operators.enrich import enrich_ip_range

    rows = mmdb_to_rows(mmdb_path)
    ranges = spark.createDataFrame(
        [(r["ip_lo"], r["ip_hi"], r["country_iso_code"]) for r in rows],
        "ip_lo long, ip_hi long, country_iso_code string",
    )
    events = spark.createDataFrame(
        [("10.1.2.3",), ("192.168.9.9",), ("8.8.8.8",)], "ip string"
    )
    out = enrich_ip_range(events, ranges, ip_col="ip")
    got = {r.ip: r.country_iso_code for r in out.collect()}
    assert got == {"10.1.2.3": "AA", "192.168.9.9": "BB", "8.8.8.8": None}


@pytest.fixture(scope="module")
def mmdb6_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mmdb6") / "test6.mmdb"
    nets = {
        # 2001:db8::/32
        (0x20010db8 << 96, 32): enc_map(
            {"country": enc_map({"iso_code": enc_str("DD")})}
        ),
        # ::ffff:10.0.0.0/104 (v4-mapped 10.0.0.0/8)
        ((0xffff << 32) | (10 << 24), 104): enc_map(
            {"country": enc_map({"iso_code": enc_str("AA")})}
        ),
        # 8000::/1 — exercises the address-space-top exclusive bound
        (1 << 127, 1): enc_map(
            {"country": enc_map({"iso_code": enc_str("TOP")})}
        ),
        # ::/96-rooted v4 (the MaxMind v4-in-v6 convention): 10.0.0.0/8
        (10 << 24, 104): enc_map(
            {"country": enc_map({"iso_code": enc_str("A4")})}
        ),
    }
    p.write_bytes(build_mmdb(nets, total_bits=128, ip_version=6))
    return str(p)


def test_networks6_and_rows6(mmdb6_path):
    from tools.mmdb_to_ranges import MMDBReader, mmdb_to_rows6

    r = MMDBReader.open(mmdb6_path)
    assert r.metadata["ip_version"] == 6
    nets = {(pfx, plen) for pfx, plen, _ in r.networks6()}
    assert (0x20010db8 << 96, 32) in nets
    assert (1 << 127, 1) in nets
    rows = {row["ip6_lo"]: row for row in mmdb_to_rows6(mmdb6_path)}
    dd = rows["20010db8" + "0" * 24]
    assert dd["country_iso_code"] == "DD"
    assert dd["ip6_hi"] == "20010db9" + "0" * 24
    top = rows["8" + "0" * 31]
    assert top["ip6_hi"] == "f" * 33  # top-of-space exclusive bound
    # the v4-mapped subtree also appears in the legacy v4 enumeration
    v4rows = {row["ip_lo"] for row in __import__("tools.mmdb_to_ranges",
              fromlist=["mmdb_to_rows"]).mmdb_to_rows(mmdb6_path)}
    assert (10 << 24) in v4rows


def test_mmdb6_feeds_enrich_ip6_range(mmdb6_path, spark):
    from tools.mmdb_to_ranges import mmdb_to_rows6
    from vector_spark.operators.enrich import enrich_ip6_range

    dim = spark.createDataFrame(mmdb_to_rows6(mmdb6_path)).select(
        "ip6_lo", "ip6_hi", F.col("country_iso_code").alias("cc")
    )
    events = spark.createDataFrame(
        [(1, "2001:db8::1"), (2, "::ffff:10.1.2.3"),
         (3, "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"), (4, "2001:dc0::1")],
        "id long, ip string",
    )
    got = {r.id: r.cc for r in enrich_ip6_range(events, dim, "ip").collect()}
    assert got == {1: "DD", 2: "AA", 3: "TOP", 4: None}


def test_reader_on_real_maxmind_test_fixtures():
    """The PUBLIC MaxMind test databases the reference vendors for its own
    validation (tests/data/*.mmdb) parse with documented contents:
    1.0.0.x → AS1221 Telstra in GeoLite2-ASN-Test, 2.125.160.216/29 →
    Boxford/GB in GeoIP2-City-Test."""
    import pytest as _pytest

    from pathlib import Path

    base = Path("/root/reference/tests/data")
    if not (base / "GeoLite2-ASN-Test.mmdb").exists():
        _pytest.skip("reference fixtures unavailable")

    asn = list(mmdb_to_rows(str(base / "GeoLite2-ASN-Test.mmdb")))
    by_org = {
        r.get("autonomous_system_organization"): r for r in asn
    }
    assert "Telstra Pty Ltd" in by_org
    t = by_org["Telstra Pty Ltd"]
    assert t["autonomous_system_number"] == 1221
    # 1.128.0.0 = 25165824 — the documented Telstra test range start
    assert t["ip_lo"] == 25165824

    city = list(mmdb_to_rows(str(base / "GeoIP2-City-Test.mmdb")))
    boxford = [r for r in city if r.get("city_names_en") == "Boxford"]
    assert boxford and boxford[0]["country_iso_code"] == "GB"
    assert boxford[0]["location_time_zone"] == "Europe/London"
