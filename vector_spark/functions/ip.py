"""VRL IP functions → Column builders (pure bitwise/regex expressions —
no UDFs; IPv4 math is closed-form over the dotted quad).

Parity: ip_aton/ip_ntoa (a.k.a. ip_pton/ip_ntop for v4), ip_cidr_contains,
ip_subnet, is_ipv4, is_ipv6 (reference
website/cue/reference/remap/functions/ip_*.cue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IPV4_RE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def is_ipv4(col: Column) -> Column:
    octets = F.split(col, r"\.")
    return col.rlike(IPV4_RE) & (
        F.size(F.filter(octets, lambda o: o.cast("int") <= 255)) == 4
    )


def is_ipv6(col: Column) -> Column:
    return col.rlike(r"^[0-9a-fA-F:]+$") & col.contains(":")


def ip_aton(col: Column) -> Column:
    """dotted-quad → uint32 (as long)."""
    o = lambda i: F.regexp_extract(col, IPV4_RE, i).cast("long")  # noqa: E731
    return o(1) * 16777216 + o(2) * 65536 + o(3) * 256 + o(4)


def ip_ntoa(col: Column) -> Column:
    """uint32 (long) → dotted quad."""
    c = col.cast("long")
    return F.concat_ws(
        ".",
        ((c / 16777216).cast("long") % 256).cast("string"),
        ((c / 65536).cast("long") % 256).cast("string"),
        ((c / 256).cast("long") % 256).cast("string"),
        (c % 256).cast("string"),
    )


def ip_subnet(col: Column, prefix: int) -> Column:
    """Network address of ip at /prefix (v4)."""
    mask = (0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF
    return ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask)))


def ip_cidr_contains(cidr: str, col: Column) -> Column:
    """ip_cidr_contains('10.0.0.0/8', ip_col) — v4 only."""
    net, prefix = cidr.split("/")
    p = int(prefix)
    mask = (0xFFFFFFFF << (32 - p)) & 0xFFFFFFFF
    net_int = 0
    for part in net.split("."):
        net_int = net_int * 256 + int(part)
    return ip_aton(col).bitwiseAND(F.lit(mask)) == F.lit(net_int & mask)
