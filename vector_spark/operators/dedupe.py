"""dedupe — drop events whose field-fingerprint was already seen.

Parity: reference src/transforms/dedupe/transform.rs:69-139.
- fingerprint = the values of ``fields.match`` (default
  ``[timestamp, host, message]``, dedupe/mod.rs:30-82) or all fields except
  ``fields.ignore`` (transform.rs:91-126);
- type-aware: int ``1`` ≠ string ``"1"`` (transform.rs:54-67) — free in
  Spark, where columns are typed;
- the reference keeps the FIRST occurrence (LRU cache of 5000 entries,
  dedupe/mod.rs:24-28 — an *approximation* forced by bounded memory; the
  batch engine computes the exact first-occurrence set).

Batch: ``row_number() over (partition by fingerprint order by order_by) == 1``
when order matters, else ``dropDuplicates`` (cheaper: map-side partial
aggregation, no global sort). Streaming parity: ``dropDuplicates`` +
watermark ≙ LRU/state TTL (vector_spark.streaming).

Scale: one shuffle on the fingerprint columns; partial (map-side) dedupe
makes the shuffle carry only distinct keys per task — the right plan at 10^12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StructType, VariantType


def _path_key(df: DataFrame, k: str) -> Column | None:
    """Resolve a match field to a key expression. Dotted names are PATHS
    into nested events (dedupe.toml dedupe_nested_fields: ``a.b.c``);
    navigation that the schema cannot satisfy is an always-absent component
    (value-or-null key contract, dedupe/mod.rs) and drops out."""
    if k in df.columns:
        return F.col(f"`{k}`")
    parts = k.split(".")
    if len(parts) < 2 or parts[0] not in df.columns:
        return None
    dt = df.schema[parts[0]].dataType
    if isinstance(dt, VariantType):
        # string-extract: scalar leaves compare by value, absent → null
        return F.try_variant_get(
            F.col(parts[0]), "$." + ".".join(parts[1:]), "string"
        )
    col = F.col(parts[0])
    for p in parts[1:]:
        if isinstance(dt, StructType):
            if p not in dt.fieldNames():
                return None
            dt = dt[p].dataType
        elif isinstance(dt, MapType):
            dt = dt.valueType
        else:
            return None
        col = col.getItem(p)
    return col


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Keep one event per distinct value-tuple of the match fields.

    ``match`` and ``ignore`` are mutually exclusive (reference config
    semantics, dedupe/mod.rs:30-52). With ``order_by``, keeps the first row
    in that order (exact reference keep-first semantics); without, keeps an
    arbitrary representative (cheapest plan — use when any witness works).
    """
    if match and ignore:
        raise ValueError("match and ignore are mutually exclusive")
    names = match if match else [c for c in df.columns if c not in set(ignore or [])]
    # a match field absent from the frame is null on EVERY event — all
    # events share that cache-key component (dedupe/mod.rs builds the key
    # from the event's value-or-null), so it simply drops out of the key
    resolved = [(k, _path_key(df, k)) for k in names]
    keys = [k for k, c in resolved if c is not None and k in df.columns]
    nested = [(k, c) for k, c in resolved if c is not None and k not in df.columns]
    if nested:
        # dotted-path components materialize as temp key columns
        tmp = {f"__k{i}": c for i, (_, c) in enumerate(nested)}
        out = dedupe(
            df.withColumns(tmp),
            match=keys + list(tmp),
            order_by=order_by,
        )
        return out.drop(*tmp)
    if not keys:
        keys_cols = [F.lit(1)]
        if order_by:
            w = Window.partitionBy(*keys_cols).orderBy(*order_by)
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        return df.limit(1)
    if order_by:
        w = Window.partitionBy(*keys).orderBy(*order_by)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return df.dropDuplicates(keys)
