"""enrich — lookup-join enrichment tables (the reference's only join).

Parity: reference lib/enrichment/src/{lib.rs,tables.rs} — ``find_table_row``
with ``Condition::Equals{field,value}`` and ``Condition::BetweenDates{from,to}``,
optional case-insensitive match, optional ``select`` projection, and the
0-or-1-row contract (lib.rs:40-51: error when zero or multiple rows match).
Exposed to VRL as ``get_enrichment_table_record`` /
``find_enrichment_table_records``.

Spark-first: a **broadcast hash join** — the dimension is small by
construction (an in-memory CSV/geoip table in the reference), so the join is
shuffle-free on the fact side; the "exactly one row" contract becomes a
load-time key-uniqueness validation instead of a per-row error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_unique_key(dim: DataFrame, keys: list[str]) -> None:
    """Enforce the reference's one-row-per-key contract at load time."""
    dupes = dim.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dupes:
        raise ValueError(f"enrichment table has duplicate keys on {keys}")


def enrich(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    select: list[str] | None = None,
    case_insensitive: bool = False,
    required: bool = False,
    validate: bool = False,
) -> DataFrame:
    """Equality-lookup enrichment via broadcast left join.

    ``required=True`` drops rows with no match (≙ the VRL pattern of
    aborting on lookup failure); default keeps them with null enrichment.
    """
    if validate:
        validate_unique_key(dim, on)
    if select:
        dim = dim.select(*on, *select)
    if case_insensitive:
        fold = {k: f"__k_{k}" for k in on}
        left = df
        right = dim
        for k, fk in fold.items():
            left = left.withColumn(fk, F.lower(F.col(k)))
            right = right.withColumn(fk, F.lower(F.col(k))).drop(k)
        joined = left.join(F.broadcast(right), on=list(fold.values()), how="left")
        joined = joined.drop(*fold.values())
    else:
        joined = df.join(F.broadcast(dim), on=on, how="left")
    if required:
        probe = (select or [c for c in dim.columns if c not in on])[0]
        joined = joined.filter(F.col(probe).isNotNull())
    return joined


def enrich_ip_range(
    df: DataFrame,
    dim: DataFrame,
    ip_col: str,
    lo_col: str = "ip_lo",
    hi_col: str = "ip_hi",
    bucket_bits: int | None = None,
) -> DataFrame:
    """GeoIP-style enrichment: broadcast range join of an IP column against
    a (numeric) CIDR-range table (≙ reference geoip/mmdb enrichment tables,
    src/enrichment_tables/mod.rs:17-37 — the mmdb binary format is replaced
    by a plain range table; ranges must be non-overlapping).

    ``dim`` carries ``[lo_col, hi_col)`` as uint32 longs (see
    functions.ip.ip_aton) plus the enrichment payload columns.

    Scale shape: a raw theta-join ``lo <= n < hi`` plans as a
    BroadcastNestedLoopJoin — O(rows × ranges) comparisons (measured 87 s
    for 1M rows × 1k ranges). Instead each range is exploded to the fixed
    2^``bucket_bits``-wide buckets it overlaps and the probe joins on
    bucket equality — a Broadcast **Hash** Join with the range bounds as a
    residual filter, O(rows × ranges-per-bucket). ``bucket_bits`` defaults
    from the widest range so each range spans ≤5 buckets; tune it down for
    dims mixing very wide and very narrow ranges.
    """
    from vector_spark.functions.ip import ip_aton

    dim = dim.filter(F.col(hi_col) > F.col(lo_col))
    if bucket_bits is None:
        max_w = dim.agg(F.max(F.col(hi_col) - F.col(lo_col))).collect()[0][0]
        # dim is broadcast-sized by contract, so the driver-side stat is cheap
        bucket_bits = max(8, (int(max_w or 1) - 1).bit_length() - 2)
    exp = dim.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.shiftright(F.col(lo_col), bucket_bits),
                F.shiftright(F.col(hi_col) - 1, bucket_bits),
            )
        ),
    )
    n = ip_aton(df[ip_col])
    cond = (
        (F.shiftright(n, bucket_bits) == exp["__bkt"])
        & (n >= exp[lo_col])
        & (n < exp[hi_col])
    )
    return df.join(F.broadcast(exp), on=cond, how="left").drop(
        lo_col, hi_col, "__bkt"
    )


def enrich_ip6_range(
    df: DataFrame,
    dim: DataFrame,
    ip_col: str,
    lo_col: str = "ip6_lo",
    hi_col: str = "ip6_hi",
    prefix_chars: int | None = None,
) -> DataFrame:
    """IPv6 variant of :func:`enrich_ip_range`. ``dim`` carries the
    half-open range ``[lo_col, hi_col)`` as 32-char lowercase hex strings
    (:func:`vector_spark.functions.ip.ip6_expand_hex`) — equal-length hex
    compares lexicographically == numerically, so no 128-bit arithmetic
    is needed anywhere.

    Same scale shape as the v4 path: each range explodes to the hex-prefix
    buckets it overlaps (``prefix_chars`` leading nibbles) and the probe
    joins on bucket equality — Broadcast Hash Join with the bounds as a
    residual string-compare filter. ``prefix_chars`` auto-selects the
    longest prefix in {12,10,8,6,4} whose total bucket expansion stays
    ≤ 4× the dim (dim is broadcast-sized by contract, so the driver-side
    stat is cheap)."""
    from vector_spark.functions.ip import ip6_expand_hex

    dim = dim.filter(F.col(hi_col) > F.col(lo_col))
    pval = lambda c, p: F.conv(F.substring(c, 1, p), 16, 10).cast("long")  # noqa: E731
    if prefix_chars is None:
        n_ranges, stats = 0, {}
        row = dim.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    pval(F.col(hi_col), p) - pval(F.col(lo_col), p) + 1
                ).alias(f"s{p}")
                for p in (12, 10, 8, 6, 4)
            ],
        ).collect()[0]
        n_ranges = row["n"] or 0
        prefix_chars = 4
        for p in (12, 10, 8, 6, 4):
            if (row[f"s{p}"] or 0) <= 4 * max(n_ranges, 1):
                prefix_chars = p
                break
    p = prefix_chars
    exp = dim.withColumn(
        "__bkt", F.explode(F.sequence(pval(F.col(lo_col), p), pval(F.col(hi_col), p)))
    )
    # materialize the (expensive) expansion once — the join condition
    # references it three times (bucket key + both bounds)
    probe = df.withColumn("__hex32", ip6_expand_hex(df[ip_col]))
    hex32 = probe["__hex32"]
    cond = (
        (pval(hex32, p) == exp["__bkt"])
        & (hex32 >= exp[lo_col])
        & (hex32 < exp[hi_col])
    )
    return probe.join(F.broadcast(exp), on=cond, how="left").drop(
        lo_col, hi_col, "__bkt", "__hex32"
    )


def enrich_between_dates(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    ts_col: str,
    from_col: str = "from_ts",
    to_col: str = "to_ts",
) -> DataFrame:
    """Date-range lookup (``Condition::BetweenDates``): equality keys plus
    ``from_ts <= ts < to_ts``. Broadcast theta-join — shuffle-free; ranges
    are expected non-overlapping per key (validated upstream)."""
    cond = F.lit(True)
    for k in on:
        cond = cond & (df[k] == dim[k])
    cond = cond & (df[ts_col] >= dim[from_col]) & (df[ts_col] < dim[to_col])
    out = df.join(F.broadcast(dim), on=cond, how="left")
    for k in on:
        out = out.drop(dim[k])
    return out
