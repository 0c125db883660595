"""route / exclusive_route — predicate fan-out to named outputs.

Parity:
- ``route`` (reference src/transforms/route.rs:39-54): **non-exclusive** —
  every event is tested against every condition and copied to ALL matching
  outputs; events matching none go to ``_unmatched`` when
  ``reroute_unmatched`` (default true, route.rs:50-52). Reserved output names
  ``_unmatched`` / ``_default`` (route.rs:79-86).
- ``exclusive_route`` (reference src/transforms/exclusive_route/
  transform.rs:39-51): first-match-wins; unmatched → ``_unmatched``.

Scale notes (SURVEY.md §7 hard-part 4): fan-out from one DataFrame means the
upstream is re-evaluated once per output unless persisted. We compute ALL
match columns in a single projection and (optionally) persist that slim
intermediate, so the expensive upstream (parse UDFs, joins) runs once; each
output is then a cheap filter over it. ``exclusive_route`` instead emits ONE
DataFrame with a ``route`` column — the right shape for a partitioned write
(``.write.partitionBy('route')``), which is a single pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from vector_spark.conditions import ConditionLike, to_column

UNMATCHED = "_unmatched"
_RESERVED = {"_unmatched", "_default"}


def _check_names(routes: dict[str, ConditionLike]) -> None:
    bad = _RESERVED & set(routes)
    if bad:
        raise ValueError(f"reserved route name(s): {sorted(bad)}")


def route(
    df: DataFrame,
    routes: dict[str, ConditionLike],
    reroute_unmatched: bool = True,
    persist: bool = False,
) -> dict[str, DataFrame]:
    """Non-exclusive routing: an event lands in EVERY route it matches.

    Returns ``{name: DataFrame}`` (+ ``'_unmatched'`` when enabled). Match
    columns are computed in one projection; with ``persist=True`` the
    annotated frame is persisted (MEMORY_AND_DISK) so multi-sink fan-out
    costs one upstream evaluation — at the 10^12 tier prefer persisting the
    *slim* post-parse projection or recomputing, per sink budget.
    """
    _check_names(routes)
    flags = {name: f"__m_{k}" for k, name in enumerate(routes)}
    annotated = df.select(
        "*", *[to_column(c, df).alias(flags[n]) for n, c in routes.items()]
    )
    if persist:
        annotated = annotated.persist(StorageLevel.MEMORY_AND_DISK)
    drop = list(flags.values())
    out = {
        name: annotated.filter(F.col(flag)).drop(*drop)
        for name, flag in flags.items()
    }
    if reroute_unmatched:
        any_match = None
        for f in flags.values():
            c = F.coalesce(F.col(f), F.lit(False))
            any_match = c if any_match is None else (any_match | c)
        out[UNMATCHED] = annotated.filter(~any_match).drop(*drop)
    return out


def route_label(
    df: DataFrame,
    routes: dict[str, ConditionLike],
    reroute_unmatched: bool = True,
    label_col: str = "route",
) -> DataFrame:
    """Non-exclusive routing as ONE DataFrame with a ``route`` label column;
    an event matching k routes appears k times (reference copy semantics,
    route.rs:42-49). Single-pass: posexplode over the match array — no
    persist needed, ideal upstream of a ``partitionBy(route)`` write.
    """
    _check_names(routes)
    names = list(routes)
    matches = F.array(
        *[
            F.when(to_column(routes[n], df), F.lit(n))
            for n in names
        ]
    )
    labels = F.filter(matches, lambda x: x.isNotNull())
    if reroute_unmatched:
        labels = F.when(F.size(labels) == 0, F.array(F.lit(UNMATCHED))).otherwise(labels)
    else:
        labels = F.when(F.size(labels) == 0, F.array().cast("array<string>")).otherwise(labels)
    return df.withColumn(label_col, F.explode(labels))


def exclusive_route(
    df: DataFrame,
    routes: dict[str, ConditionLike],
    label_col: str = "route",
) -> DataFrame:
    """First-match-wins routing → one ``route`` column (then filter or
    ``write.partitionBy(route)``). Unmatched rows get ``'_unmatched'``."""
    _check_names(routes)
    expr = None
    for name, cond in routes.items():
        c = to_column(cond, df)
        expr = F.when(c, name) if expr is None else expr.when(c, name)
    return df.withColumn(label_col, expr.otherwise(UNMATCHED))
