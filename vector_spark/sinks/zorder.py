"""Z-order (Morton-curve) data layout for multi-dimensional file pruning.

The reference's sinks write opaque byte streams (`src/sinks/file/mod.rs`);
at the 10^12-row tier the layout of the landed files IS the query
optimizer's cheapest tool: parquet keeps per-file/row-group min-max
stats, and a scan skips every file whose stat range misses the filter.
A single-column sort clusters ONE dimension perfectly and leaves every
other filter reading all files; interleaving the bits of two-or-more
dimensions (the Morton / Z-order curve, the same layout Delta's
OPTIMIZE ZORDER and Iceberg's sort-order z-transform produce) gives
every interleaved dimension ~√F-of-F file locality.

Everything here is closed-form integer bit math — `zorder_key` is
reproducible by any engine (DuckDB oracle `seq_zorder`), and the
pruning claim is machine-checked in tests by reading parquet footer
stats, not by trusting the writer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into one BIGINT Morton key: bit ``b`` of column ``c`` lands
    at position ``b * n_cols + c``. Values are clamped to ``2^bits - 1``
    so outliers degrade locality instead of overflowing."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    cap = (1 << bits) - 1
    acc = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        col = F.least(F.col(c) if isinstance(c, str) else c, F.lit(cap)).cast(
            "long"
        )
        for b in range(bits):
            acc = acc + F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + c_idx
            )
    return acc


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB mirror of :func:`zorder_key` (same clamp, same bit
    placement) — used by the oracle and by any other engine that needs
    to reproduce the key."""
    n = len(cols)
    cap = (1 << bits) - 1
    # NB: DuckDB gives << lower precedence than +, so every term gets
    # its own outer parens or the sum associates into the shift amounts.
    terms = [
        f"((((least({c}, {cap})::BIGINT >> {b}) & 1)) << {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as ``n_files`` parquet files clustered on the Z-curve
    of ``cols``: range-partition on the Morton key (contiguous curve
    segments per file), sort within each file (tight row-group stats),
    write. Readers filtering on ANY of ``cols`` then skip most files on
    footer stats alone — no index, no extra service, just layout."""
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_stat_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-file [min, max] of ``cols`` from the parquet footers (the
    exact information a stats-based scan planner uses). Test/audit
    helper — runs driver-side over the footer metadata only."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                st = col.statistics
                lo[name] = st.min if name not in lo else min(lo[name], st.min)
                hi[name] = st.max if name not in hi else max(hi[name], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols if c in lo})
    return out


def files_overlapping(
    ranges: list[dict[str, tuple]], col: str, value: object
) -> int:
    """How many files a point filter ``col == value`` must read under
    stats-based skipping."""
    return sum(1 for r in ranges if col in r and r[col][0] <= value <= r[col][1])
