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


def _prefix_len(spec: int | str) -> int:
    """Subnet spec → prefix length: 24, "/24", a dotted v4 mask
    ("255.255.0.0") or a v6 mask ("ffff:ffff::") — leading-ones count
    (ip_subnet.cue 'subnet' argument forms). Plan-time only."""
    import ipaddress

    if isinstance(spec, int):
        return spec
    s = str(spec)
    if s.startswith("/"):
        return int(s[1:])
    if ":" in s:
        bits = bin(int(ipaddress.IPv6Address(s)))[2:].zfill(128)
    else:
        bits = bin(int(ipaddress.IPv4Address(s)))[2:].zfill(32)
    i = bits.find("0")
    return len(bits) if i == -1 else i


def _ip6_net_hex(col: Column, prefix: int) -> Column:
    """Masked network of a v6 address as 32-nibble hex."""
    h = ip6_expand_hex(col)
    full, rem = prefix // 4, prefix % 4
    kept = F.substring(h, 1, full)
    if rem:
        nib = F.conv(F.substring(h, full + 1, 1), 16, 10).cast("int")
        mask = (0xF << (4 - rem)) & 0xF
        kept = F.concat(kept, F.lower(F.hex(nib.bitwiseAND(F.lit(mask)))))
    return F.rpad(kept, 32, "0")


def _ip6_format(hex32: Column) -> Column:
    """32-nibble hex → compressed v6 string (trailing zero-run → ``::``)."""
    groups = [
        F.regexp_replace(F.substring(hex32, i * 4 + 1, 4), "^0{1,3}", "")
        for i in range(8)
    ]
    joined = F.concat_ws(":", *groups)
    out = F.regexp_replace(joined, "(:0)+$", "::")
    return F.regexp_replace(out, "^0::$", "::")


def ip_subnet(col: Column, prefix: int | str) -> Column:
    """Network address of ip at the given subnet spec — v4 and v6
    (ip_subnet.cue): prefix int, "/N", dotted v4 mask, or v6 mask."""
    p = _prefix_len(prefix)
    mask4 = (0xFFFFFFFF << (32 - min(p, 32))) & 0xFFFFFFFF
    v4 = ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask4)))
    v6 = _ip6_format(_ip6_net_hex(col, p))
    return F.when(is_ipv4(col), v4).otherwise(F.when(is_ipv6(col), v6))


def ip_cidr_contains(cidr: str, col: Column) -> Column:
    """ip_cidr_contains('10.0.0.0/8' | '2404:6800::/32', ip_col) — v4 + v6;
    an address of the other family is simply not contained."""
    net, prefix = cidr.split("/")
    p = int(prefix)
    if ":" in net:
        import ipaddress

        nethex = f"{int(ipaddress.IPv6Address(net)):032x}"
        full, rem = p // 4, p % 4
        expect = nethex[:full]
        if rem:
            mask = (0xF << (4 - rem)) & 0xF
            expect += f"{int(nethex[full], 16) & mask:x}"
        expect = expect.ljust(32, "0")
        return F.coalesce(
            is_ipv6(col) & (_ip6_net_hex(col, p) == F.lit(expect)),
            F.lit(False),
        )
    mask = (0xFFFFFFFF << (32 - p)) & 0xFFFFFFFF
    net_int = 0
    for part in net.split("."):
        net_int = net_int * 256 + int(part)
    return F.coalesce(
        is_ipv4(col)
        & (ip_aton(col).bitwiseAND(F.lit(mask)) == F.lit(net_int & mask)),
        F.lit(False),
    )


def ip6_expand_hex(col: Column) -> Column:
    """IPv6 string → 32-char lowercase hex of the 16-byte address
    (≙ ip_pton for v6), pure column math — no UDF:

    - ``::`` zero-compression expands to the missing all-zero groups;
    - an embedded dotted-quad tail (``::ffff:1.2.3.4``) is converted to
      its two hex groups first;
    - each group is left-padded to 4 nibbles.

    Returns NULL for strings that don't look like IPv6.

    Every intermediate (canonical form, split halves, group arrays, packed
    hex) is let-bound: Spark shares no common subexpressions across an
    expression tree, so the naive form inlined the whole upstream tree at
    each reference (~350 regexp nodes per address; one copy each here).
    """
    from vector_spark.functions.objects import let

    def canon_of(tail4: Column) -> Column:
        # embedded IPv4 tail → two hex groups (v4-mapped/compat forms)
        v4num = (
            F.regexp_extract(tail4, IPV4_RE, 1).cast("long") * 16777216
            + F.regexp_extract(tail4, IPV4_RE, 2).cast("long") * 65536
            + F.regexp_extract(tail4, IPV4_RE, 3).cast("long") * 256
            + F.regexp_extract(tail4, IPV4_RE, 4).cast("long")
        )
        return F.when(
            tail4 != "",
            let(
                v4num,
                lambda n: F.concat(
                    F.regexp_replace(col, r"((\d{1,3}\.){3}\d{1,3})$", ""),
                    F.lower(F.lpad(F.hex((n / 65536).cast("long")), 4, "0")),
                    F.lit(":"),
                    F.lower(F.lpad(F.hex(n % 65536), 4, "0")),
                ),
            ),
        ).otherwise(col)

    def expand(canon: Column) -> Column:
        def with_halves(halves: Column) -> Column:
            left = F.filter(
                F.split(F.element_at(halves, 1), ":"), lambda g: g != ""
            )
            right = F.when(
                F.size(halves) > 1,
                F.filter(F.split(F.element_at(halves, 2), ":"), lambda g: g != ""),
            ).otherwise(F.array().cast("array<string>"))

            def with_lr(l: Column, r: Column) -> Column:
                # zero-group filling is only legal with '::' compression
                # present; an uncompressed address must have all 8 groups
                missing = F.when(
                    canon.contains("::"),
                    F.greatest(F.lit(8) - F.size(l) - F.size(r), F.lit(0)),
                ).otherwise(F.lit(0))
                groups = F.concat(
                    l, F.array_repeat(F.lit("0"), missing.cast("int")), r
                )

                def with_groups(g: Column) -> Column:
                    hex32 = F.lower(
                        F.concat_ws(
                            "", F.transform(g, lambda x: F.lpad(x, 4, "0"))
                        )
                    )
                    return let(
                        hex32,
                        lambda h: F.when(
                            (F.size(g) == 8) & h.rlike("^[0-9a-f]{32}$"), h
                        ),
                    )

                return let(groups, with_groups)

            return let(left, lambda l: let(right, lambda r: with_lr(l, r)))

        return let(F.split(canon, "::", 2), with_halves)

    tail4 = F.regexp_extract(col, r"((\d{1,3}\.){3}\d{1,3})$", 1)
    return let(tail4, lambda t4: let(canon_of(t4), expand))


def ip_to_ipv6(col: Column) -> Column:
    """VRL ip_to_ipv6: v4 → v4-mapped v6 string; v6 passes through."""
    return F.when(is_ipv6(col), col).otherwise(
        F.concat(F.lit("::ffff:"), col)
    )


def ipv6_to_ipv4(col: Column) -> Column:
    """VRL ipv6_to_ipv4: a v4-mapped/compat v6 address → dotted quad
    (NULL when not v4-representable); v4 strings pass through."""
    h = ip6_expand_hex(col)
    mapped = h.rlike("^0{20}(ffff|0000)[0-9a-f]{8}$")
    num = F.conv(F.substring(h, 25, 8), 16, 10).cast("long")
    return F.when(is_ipv4(col), col).otherwise(
        F.when(mapped, ip_ntoa(num))
    )
