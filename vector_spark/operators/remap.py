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
``error_when`` / ``abort_when``, then split with filters.

Termination semantics (remap.rs:590-627): an event whose program terminates
(error OR abort) always reverts to the ORIGINAL event — mutations made
before the failure are discarded. ``drop_on_error`` / ``drop_on_abort``
decide whether the reverted event stays in ``primary`` or (with
``reroute_dropped``) lands in ``dropped`` with reason ``"error"`` /
``"abort"``. Vectorized: originals of overwritten columns are stashed in
temp columns before assignment; kept-but-terminated rows are restored with
a per-column ``when(terminated, original)`` — one projection, no union, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from vector_spark.conditions import ConditionLike, to_column

DROPPED = "dropped"
PRIMARY = "primary"

_ERR = "__rm_err"
_ABORT = "__rm_abort"


def _c(name: str) -> Column:
    """Column ref that treats a dotted name literally."""
    return F.col(f"`{name}`") if "." in name else F.col(name)


def _stamp_flags(
    df: DataFrame,
    error_when: ConditionLike | None,
    abort_when: ConditionLike | None,
) -> DataFrame:
    """Materialize the termination flags as temp columns (abort wins)."""
    abrt = (
        F.coalesce(to_column(abort_when, df), F.lit(False))
        if abort_when is not None
        else F.lit(False)
    )
    err = (
        F.coalesce(to_column(error_when, df), F.lit(False))
        if error_when is not None
        else F.lit(False)
    )
    return df.withColumn(_ABORT, abrt).withColumn(_ERR, ~F.col(_ABORT) & err)


def remap(
    df: DataFrame,
    assignments: dict[str, Column],
    error_when: ConditionLike | None = None,
    drop_on_error: bool = True,
    reroute_dropped: bool = True,
    component_id: str = "remap",
    error_message: str = "remap program failed",
    abort_when: ConditionLike | None = None,
    drop_on_abort: bool = True,
    abort_message: str = "aborted",
    simultaneous: bool = False,
) -> dict[str, DataFrame]:
    """Apply assignments; route terminated rows per the reference contract.

    Returns ``{'primary': df_ok, 'dropped': df_bad}`` (``dropped`` omitted
    unless ``reroute_dropped`` and some termination condition is set).
    ``error_when`` / ``abort_when`` are evaluated AFTER the assignments (so
    they can reference new columns, e.g. a null parse result); ``abort``
    takes precedence when both match (a VRL program terminates once).
    Terminated rows kept in ``primary`` (``drop_on_* = False``) revert to
    the original event — overwritten columns restored, new columns nulled —
    matching remap.rs:619-623 which forwards ``original_event``.
    """
    orig_names = {
        name: f"__rm_orig_{i}"
        for i, name in enumerate(assignments)
        if name in df.columns
    }
    applied = df
    for name, tmp in orig_names.items():
        applied = applied.withColumn(tmp, _c(name))
    if simultaneous:
        # assignments are closed over the ORIGINAL columns (the VRL
        # compiler substitutes sequential reads at compile time) — one
        # projection, every expr sees the pre-mutation frame. The
        # error/abort conditions are ALSO closed over the originals, so
        # materialize the flags BEFORE the projection — a self-overwrite
        # (`.foo = split!(.foo, …)`) must not re-resolve against new .foo
        if error_when is not None or abort_when is not None:
            applied = _stamp_flags(applied, error_when, abort_when)
        existing = set(applied.columns)
        applied = applied.select(
            *[
                assignments[c].alias(c) if c in assignments else _c(c)
                for c in applied.columns
            ],
            *[
                expr.alias(name)
                for name, expr in assignments.items()
                if name not in existing
            ],
        )
    else:
        for name, expr in assignments.items():
            applied = applied.withColumn(name, expr)

    if error_when is None and abort_when is None:
        return {PRIMARY: applied.drop(*orig_names.values())}

    if not simultaneous:
        # sequential mode: conditions are evaluated AFTER the assignments
        # (they may reference new columns, e.g. a null parse result)
        applied = _stamp_flags(applied, error_when, abort_when)

    # rows that terminated but are configured to stay in primary revert
    # in place (remap.rs:619-623)
    revert = (F.col(_ABORT) & F.lit(not drop_on_abort)) | (
        F.col(_ERR) & F.lit(not drop_on_error)
    )
    new_types = {f.name: f.dataType for f in applied.schema.fields}
    old_types = {f.name: f.dataType for f in df.schema.fields}
    reverted = applied
    for name in assignments:
        if name in orig_names:
            original = F.col(orig_names[name])
            if new_types[name] != old_types[name]:
                # a type-changing self-overwrite can't carry the original
                # value in the new schema; try_cast where a cast exists,
                # null otherwise (complex targets) — documented limitation
                # of revert-on-keep under a fixed schema
                if isinstance(
                    new_types[name], (ArrayType, MapType, StructType)
                ):
                    original = F.lit(None).cast(new_types[name])
                else:
                    original = original.try_cast(new_types[name])
        else:
            original = F.lit(None)
        reverted = reverted.withColumn(
            name, F.when(revert, original).otherwise(_c(name))
        )

    gone = (F.col(_ABORT) & F.lit(drop_on_abort)) | (
        F.col(_ERR) & F.lit(drop_on_error)
    )
    temps = [_ERR, _ABORT, *orig_names.values()]
    out: dict[str, DataFrame] = {
        PRIMARY: reverted.filter(~gone).drop(*temps)
    }
    if reroute_dropped:
        # original event + annotation (remap.rs:482-543): project back to
        # the original columns, restoring overwritten ones from the stash.
        original_cols = [
            F.col(orig_names[c]).alias(c) if c in orig_names else _c(c)
            for c in df.columns
        ]
        bad = applied.filter(gone)
        out[DROPPED] = bad.select(
            *original_cols,
            F.struct(
                F.when(F.col(_ABORT), F.lit("abort"))
                .otherwise(F.lit("error"))
                .alias("reason"),
                F.when(F.col(_ABORT), F.lit(abort_message))
                .otherwise(F.lit(error_message))
                .alias("message"),
                F.lit(component_id).alias("component_id"),
            ).alias("metadata_dropped"),
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
