"""sample — forward 1-in-N events, deterministically.

Parity: reference src/transforms/sample/transform.rs:50-142.
- keyed mode: keep iff ``hash(key) % rate == 0`` (reference uses seahash,
  transform.rs:109-119; we use Spark's xxhash64 — same *semantics*
  (deterministic 1/N by key), different hash family — divergence documented
  in SURVEY.md §7 hard-part 1).
- counter mode: per-``group_by``-bucket modulo counter (transform.rs:107-117)
  ≙ ``row_number() over (partition by group order by <order>) % rate == 1``.
- ``exclude`` condition bypasses sampling (transform.rs:52-64).
- kept events are stamped with ``sample_rate`` (transform.rs:120-136).

Scale: keyed mode is a narrow filter (no shuffle, pushes past scans);
counter mode shuffles on the group key — prefer keyed mode at the 10^12 tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.conditions import ConditionLike, to_column


def sample(
    df: DataFrame,
    rate: int,
    key_field: str | None = None,
    group_by: list[str] | None = None,
    order_by: str | None = None,
    exclude: ConditionLike | None = None,
    stamp: bool = True,
    hasher=None,
) -> DataFrame:
    """``hasher``: optional Column->Column hash for keyed mode (default
    xxhash64; pass functions.crypto.portable_hash for an oracle-
    reproducible family)."""
    if rate <= 0:
        raise ValueError("rate must be >= 1")
    excl = to_column(exclude, df) if exclude is not None else None
    if key_field is not None:
        h = hasher(F.col(key_field)) if hasher else F.xxhash64(F.col(key_field))
        keep = F.pmod(h, F.lit(rate)) == 0
    else:
        # counter mode shuffles on group_by; with group_by=None the window
        # is GLOBAL (single partition) — fine for tests, not for 10^12 rows
        # (prefer keyed mode at scale; SCALING.md)
        if order_by is None:
            raise ValueError("counter-mode sample needs order_by for determinism")
        w = (
            Window.partitionBy(*(group_by or [F.lit(1)]))
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # first of every stride: rows 1, 1+rate, 1+2*rate, ... ((rn-1) % rate
        # == 0 — NOT rn % rate == 1, which drops everything at rate=1).
        # Excluded events bypass the sampler BEFORE the counter increments
        # (reference transform.rs:52-64) — number only non-excluded rows so
        # an exclude match never shifts the stride.
        rn = (
            F.sum(F.when(excl, F.lit(0)).otherwise(F.lit(1))).over(w)
            if excl is not None
            else F.count(F.lit(1)).over(w)
        )
        keep = ((rn - 1) % rate) == 0
    if excl is not None:
        keep = excl | keep
    out = df.withColumn("__excl", excl if excl is not None else F.lit(False))
    out = out.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")
    if stamp:
        # reference stamps sample_rate only on events that went THROUGH the
        # sampler (transform.rs:120-136); exclude-bypassed rows are untouched
        out = out.withColumn(
            "sample_rate", F.when(~F.col("__excl"), F.lit(rate))
        )
    return out.drop("__excl")
