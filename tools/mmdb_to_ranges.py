"""mmdb → range-table parquet: feed GeoIP databases into enrich_ip_range.

Parity: reference src/enrichment_tables/mmdb.rs reads MaxMind DB files via
the maxminddb crate; the Spark-side engine shape is already right
(vector_spark/operators/enrich.py::enrich_ip_range — numeric start/end
broadcast range join). This tool closes the gap: it converts a real .mmdb
file into that range table. No maxminddb Python package exists in this
image, so the reader implements the PUBLIC MaxMind DB file format spec
(https://maxmind.github.io/MaxMind-DB/) from scratch: metadata map at the
tail marker, fixed-size binary search tree, type-tagged data section.

Usage:
    python tools/mmdb_to_ranges.py GeoLite2-Country.mmdb out.parquet
    # then: enrich_ip_range(df, spark.read.parquet("out.parquet"), ...)

The conversion runs driver-side (an mmdb is a dimension file, mebibytes,
not data-plane input); the OUTPUT is the distributed artifact.
"""

from __future__ import annotations

import struct
import sys

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"


class MMDBReader:
    """Minimal reader: metadata, tree walk, network enumeration, lookups."""

    def __init__(self, buf: bytes):
        self.buf = buf
        idx = buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise ValueError("not an mmdb file (metadata marker missing)")
        self.metadata, _ = self._decode(idx + len(_METADATA_MARKER), base=idx + len(_METADATA_MARKER))
        self.node_count = self.metadata["node_count"]
        self.record_size = self.metadata["record_size"]
        self.ip_version = self.metadata.get("ip_version", 6)
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_start = self.tree_size + 16  # 16-byte zero separator

    @classmethod
    def open(cls, path: str) -> "MMDBReader":
        with open(path, "rb") as f:
            return cls(f.read())

    # -- search tree --------------------------------------------------------

    def _record(self, node: int, side: int) -> int:
        off = node * self.node_bytes
        if self.record_size == 24:
            o = off + side * 3
            return int.from_bytes(self.buf[o : o + 3], "big")
        if self.record_size == 28:
            mid = self.buf[off + 3]
            if side == 0:
                return ((mid >> 4) << 24) | int.from_bytes(self.buf[off : off + 3], "big")
            return ((mid & 0x0F) << 24) | int.from_bytes(self.buf[off + 4 : off + 7], "big")
        if self.record_size == 32:
            o = off + side * 4
            return int.from_bytes(self.buf[o : o + 4], "big")
        raise ValueError(f"unsupported record size {self.record_size}")

    def networks(self):
        """DFS enumeration: yields (prefix_int, prefix_len, data_dict) over
        the v4 tree (ip_version 4 databases, or the ::ffff:0:0/96 subtree
        of v6 databases)."""
        root = 0
        if self.ip_version == 6:
            # descend 96 zero bits to the IPv4-mapped subtree
            for _ in range(96):
                root = self._record(root, 0)
                if root >= self.node_count:
                    return  # no v4 data
        yield from self._walk(root, 32)

    def networks6(self):
        """DFS over the FULL tree of an ip_version-6 database: yields
        (prefix_int [128-bit], prefix_len, data_dict). Python ints carry
        the 128-bit prefixes; see mmdb_to_rows6 for the hex range shape
        that feeds enrich_ip6_range."""
        if self.ip_version != 6:
            return
        yield from self._walk(0, 128)

    def _walk(self, root: int, depth_total: int):
        stack = [(root, 0, 0)]
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):
                rec = self._record(node, side)
                p = (prefix << 1) | side
                if rec == self.node_count:
                    continue  # empty branch
                if rec > self.node_count:
                    data, _ = self._decode(
                        (rec - self.node_count - 16) + self.data_start,
                        base=self.data_start,
                    )
                    yield p << (depth_total - depth - 1), depth + 1, data
                elif depth + 1 < depth_total:
                    stack.append((rec, p, depth + 1))

    # -- data section -------------------------------------------------------

    def _decode(self, pos: int, base: int):
        ctrl = self.buf[pos]
        pos += 1
        typ = ctrl >> 5
        if typ == 0:  # extended type
            typ = self.buf[pos] + 7
            pos += 1
        if typ == 1:  # pointer (into data section)
            size = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if size == 0:
                ptr = (v << 8) | self.buf[pos]
                pos += 1
            elif size == 1:
                ptr = (v << 16) | int.from_bytes(self.buf[pos : pos + 2], "big")
                ptr += 2048
                pos += 2
            elif size == 2:
                ptr = (v << 24) | int.from_bytes(self.buf[pos : pos + 3], "big")
                ptr += 526336
                pos += 3
            else:
                ptr = int.from_bytes(self.buf[pos : pos + 4], "big")
                pos += 4
            val, _ = self._decode(base + ptr, base)
            return val, pos
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + self.buf[pos]
            pos += 1
        elif size == 30:
            size = 285 + int.from_bytes(self.buf[pos : pos + 2], "big")
            pos += 2
        elif size == 31:
            size = 65821 + int.from_bytes(self.buf[pos : pos + 3], "big")
            pos += 3
        if typ == 2:  # utf8
            return self.buf[pos : pos + size].decode("utf-8"), pos + size
        if typ == 3:  # double
            return struct.unpack(">d", self.buf[pos : pos + 8])[0], pos + 8
        if typ == 4:  # bytes
            return bytes(self.buf[pos : pos + size]), pos + size
        if typ in (5, 6, 9):  # uint16/uint32/uint64
            return int.from_bytes(self.buf[pos : pos + size], "big"), pos + size
        if typ == 7:  # map
            out = {}
            for _ in range(size):
                k, pos = self._decode(pos, base)
                v, pos = self._decode(pos, base)
                out[k] = v
            return out, pos
        if typ == 8:  # int32
            v = int.from_bytes(self.buf[pos : pos + size], "big")
            if size == 4 and v >= 2**31:
                v -= 2**32
            return v, pos + size
        if typ == 11:  # array
            out = []
            for _ in range(size):
                v, pos = self._decode(pos, base)
                out.append(v)
            return out, pos
        if typ == 14:  # boolean (size IS the value)
            return bool(size), pos
        if typ == 15:  # float
            return struct.unpack(">f", self.buf[pos : pos + 4])[0], pos + 4
        raise ValueError(f"unsupported mmdb data type {typ}")


def _flatten(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "_"))
        elif isinstance(v, (str, int, float, bool)):
            out[key] = v
    return out


def mmdb_to_rows(path: str) -> list[dict]:
    """[(ip_lo, ip_hi, **flattened geo fields)] — exactly the
    enrich_ip_range dimension shape (numeric ``[lo, hi)`` half-open
    ranges, default column names)."""
    r = MMDBReader.open(path)
    rows = []
    for prefix, plen, data in r.networks():
        span = 1 << (32 - plen)
        rows.append({"ip_lo": prefix, "ip_hi": prefix + span, **_flatten(data)})
    return sorted(rows, key=lambda x: x["ip_lo"])


def mmdb_to_rows6(path: str) -> list[dict]:
    """[(ip6_lo, ip6_hi, **flattened geo fields)] with 32-char hex bounds —
    the enrich_ip6_range dimension shape (half-open, lexicographic ==
    numeric for equal-length hex)."""
    r = MMDBReader.open(path)
    rows = []
    for prefix, plen, data in r.networks6():
        hi = prefix + (1 << (128 - plen))
        # a range reaching the address-space top has no 32-char exclusive
        # bound; "f"*33 sorts after every 32-char hex (so `addr < hi` holds
        # for all addresses incl. ffff…ffff) and stays conv()-parseable
        hi_str = "f" * 33 if hi >= (1 << 128) else f"{hi:032x}"
        rows.append(
            {"ip6_lo": f"{prefix:032x}", "ip6_hi": hi_str, **_flatten(data)}
        )
    return sorted(rows, key=lambda x: x["ip6_lo"])


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    rows = mmdb_to_rows(src)
    if not rows:
        print("no v4 networks found")
        return 1
    from vector_spark.session import get_spark

    spark = get_spark("mmdb_to_ranges")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(dst)
    print(f"wrote {len(rows)} ranges to {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
