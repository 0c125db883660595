"""Network-flow correlation: community_id (v1) as pure column math.

Parity: VRL ``community_id`` (website/cue/reference/remap/functions/
community_id.cue) — the standard Corelight/Zeek flow hash
(https://github.com/corelight/community-id-spec): the 5-tuple is
canonically ordered (smaller endpoint first), packed as

    seed:u16be . saddr . daddr . proto:u8 . 0x00 . sport:u16be . dport:u16be

then ``"1:" + base64(sha1(packed))``. IPv4 only here (ip_aton covers it;
the reference's IPv6 path packs 16-byte addresses the same way).

Everything is JVM column math: hex/unhex packing, built-in sha1 + base64.
No UDF, no shuffle — a narrow projection over 10^12 rows. IPv6 endpoints
are handled per-row (the spec packs the 16-byte address the same way);
mixed-family rows order by address byte-string like the spec's byte
comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.ip import ip6_expand_hex, ip_aton, is_ipv6

_PROTO_NUM = {"icmp": 1, "tcp": 6, "udp": 17, "sctp": 132}


def _u16be(col: Column) -> Column:
    return F.unhex(F.lpad(F.hex(col.cast("long")), 4, "0"))


def _u8(col: Column) -> Column:
    return F.unhex(F.lpad(F.hex(col.cast("long")), 2, "0"))


def _addr_hex(col: Column) -> Column:
    """address → its packed-byte hex (8 chars v4, 32 chars v6)."""
    return F.when(is_ipv6(col), ip6_expand_hex(col)).otherwise(
        F.lower(F.lpad(F.hex(ip_aton(col)), 8, "0"))
    )


def community_id_packed(
    saddr: Column,
    daddr: Column,
    sport: Column,
    dport: Column,
    proto: Column | int | str,
    seed: int = 0,
) -> Column:
    """The canonical packed flow bytes (pre-sha1) — exposed separately so
    an external SQL oracle can verify the ordering/packing bit-exactly
    even where sha1 is unavailable."""
    from vector_spark.functions.objects import let

    if isinstance(proto, str):
        proto = _PROTO_NUM[proto.lower()]
    proto_col = F.lit(proto) if isinstance(proto, int) else proto

    def pack(s_hex: Column, d_hex: Column) -> Column:
        # canonical order: smaller (addr-bytes, port) endpoint first — hex
        # compare of the packed address ≡ the spec's byte-array comparison
        ordered = (s_hex < d_hex) | (
            (s_hex == d_hex) & (sport.cast("long") <= dport.cast("long"))
        )
        a1 = F.unhex(F.when(ordered, s_hex).otherwise(d_hex))
        a2 = F.unhex(F.when(ordered, d_hex).otherwise(s_hex))
        p1 = F.when(ordered, _u16be(sport)).otherwise(_u16be(dport))
        p2 = F.when(ordered, _u16be(dport)).otherwise(_u16be(sport))
        return F.concat(
            _u16be(F.lit(seed)),
            a1,
            a2,
            _u8(proto_col),
            F.unhex(F.lit("00")),
            p1,
            p2,
        )

    # let-bind each packed address: _addr_hex expands to a large
    # regexp_extract tree, and the 6 references below would otherwise
    # inline 12 copies of it — past the whole-stage-codegen size limit,
    # dropping the projection to interpreted eval (measured 7 s warm for
    # 100k rows; bound form codegens and runs in milliseconds)
    return let(
        _addr_hex(saddr), lambda s: let(_addr_hex(daddr), lambda d: pack(s, d))
    )


def community_id(
    saddr: Column,
    daddr: Column,
    sport: Column,
    dport: Column,
    proto: Column | int | str,
    seed: int = 0,
) -> Column:
    """``"1:" + base64(sha1(packed))`` per the public community-id spec."""
    packed = community_id_packed(saddr, daddr, sport, dport, proto, seed)
    return F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(packed))))
