"""remap — the VRL-program transform, vectorized.

Parity: reference src/transforms/remap.rs:554-631 — run a program per event;
on error/abort, optionally drop the event and/or reroute the ORIGINAL event,
annotated with ``{reason, message, component_id}`` under
``.metadata.dropped``, to a ``dropped`` output (remap.rs:482-543). Assigning
an array to ``.`` explodes one event into many (remap.rs:591-596).

Vectorized form (SURVEY.md §7 hard-part 3): a remap program is a set of
column assignments (built-ins from ``vector_spark.functions`` — JVM-side
fast path — or pandas UDFs for grok-class parses). Fallibility is a derived
boolean column, never row-level try/except: compute all assignments, derive
``error_when``, split with two filters. The ``dropped`` branch carries the
ORIGINAL columns (not the partial assignments), matching the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conditions import ConditionLike, to_column

DROPPED = "dropped"
PRIMARY = "primary"


def remap(
    df: DataFrame,
    assignments: dict[str, Column],
    error_when: ConditionLike | None = None,
    drop_on_error: bool = True,
    reroute_dropped: bool = True,
    component_id: str = "remap",
    error_message: str = "remap program failed",
) -> dict[str, DataFrame]:
    """Apply assignments; route failing rows to a ``dropped`` output.

    Returns ``{'primary': df_ok, 'dropped': df_bad}`` (``dropped`` omitted
    unless ``reroute_dropped``). ``error_when`` is evaluated AFTER the
    assignments (so it can reference new columns, e.g. a null parse result).
    With ``drop_on_error=False`` failing rows stay in ``primary`` with their
    (possibly null) assignment results — reference remap.rs:554-575.
    """
    applied = df
    for name, expr in assignments.items():
        applied = applied.withColumn(name, expr)

    if error_when is None:
        return {PRIMARY: applied}
    err = to_column(error_when, applied)

    out: dict[str, DataFrame] = {}
    if drop_on_error:
        out[PRIMARY] = applied.filter(~F.coalesce(err, F.lit(False)))
    else:
        out[PRIMARY] = applied
    if reroute_dropped:
        # original event + annotation (remap.rs:482-543): recompute the error
        # flag on the pre-assignment frame is impossible in general (it may
        # reference new cols), so flag on `applied` and project back to the
        # original columns.
        bad = applied.filter(F.coalesce(err, F.lit(False))).select(*df.columns)
        out[DROPPED] = bad.withColumn(
            "metadata_dropped",
            F.struct(
                F.lit("error").alias("reason"),
                F.lit(error_message).alias("message"),
                F.lit(component_id).alias("component_id"),
            ),
        )
    return out


def remap_explode(df: DataFrame, array_col: str | Column) -> DataFrame:
    """``. = [ ... ]`` semantics: one event → many (remap.rs:591-596).

    The exploded element must be a struct; its fields become the new event
    root (plus surviving lineage columns prefixed ``_``).
    """
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    lineage = [c for c in df.columns if c.startswith("_")]
    return df.select(*lineage, F.explode(col).alias("__e")).select(
        *lineage, "__e.*"
    )
