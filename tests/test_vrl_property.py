"""Property test: the VRL expression compiler agrees with a direct Python
evaluator on randomly generated expression trees (arithmetic, comparisons,
boolean logic, string concat, if-expressions, ?? coalescing).

Hypothesis generates the trees; all examples per run are evaluated in ONE
Spark action (each expression becomes a column of a single select), so the
property costs one job, not one per example.
"""

from __future__ import annotations

import math

import pytest

from vector_spark.vrl import compile_expression

# --- expression tree generator + twin renderers -----------------------------

_INT = list(range(-5, 6))
_STR = ["a", "xy", "hello", ""]


def _gen(rnd, depth: int):
    """Returns (vrl_source, python_value). Division stays guarded non-zero;
    arithmetic stays on ints so both sides agree exactly."""
    if depth == 0 or rnd.random() < 0.3:
        if rnd.random() < 0.5:
            v = rnd.choice(_INT)
            return str(v), v
        v = rnd.choice(_STR)
        return f'"{v}"', v
    kind = rnd.choice(["add", "mul", "cmp", "bool", "if", "concat", "coalesce"])
    if kind in ("add", "mul"):
        (sa, va), (sb, vb) = _gen_int(rnd, depth - 1), _gen_int(rnd, depth - 1)
        op = rnd.choice(["+", "-", "*"])
        out = {"+": va + vb, "-": va - vb, "*": va * vb}[op]
        return f"({sa} {op} {sb})", out
    if kind == "cmp":
        (sa, va), (sb, vb) = _gen_int(rnd, depth - 1), _gen_int(rnd, depth - 1)
        op = rnd.choice(["==", "!=", ">", "<", ">=", "<="])
        out = {
            "==": va == vb, "!=": va != vb, ">": va > vb,
            "<": va < vb, ">=": va >= vb, "<=": va <= vb,
        }[op]
        return f"({sa} {op} {sb})", out
    if kind == "bool":
        (sa, va), (sb, vb) = _gen_bool(rnd, depth - 1), _gen_bool(rnd, depth - 1)
        if rnd.random() < 0.3:
            return f"(!{sa})", not va
        op = rnd.choice(["&&", "||"])
        out = (va and vb) if op == "&&" else (va or vb)
        return f"({sa} {op} {sb})", out
    if kind == "if":
        (sc, vc) = _gen_bool(rnd, depth - 1)
        (sa, va), (sb, vb) = _gen_int(rnd, depth - 1), _gen_int(rnd, depth - 1)
        return f"(if {sc} {{ {sa} }} else {{ {sb} }})", va if vc else vb
    if kind == "concat":
        a, b = rnd.choice(_STR), rnd.choice(_STR)
        return f'("{a}" + "{b}")', a + b
    # coalesce: null ?? x
    (sa, va) = _gen_int(rnd, depth - 1)
    return f"(null ?? {sa})", va


def _gen_int(rnd, depth: int):
    while True:
        s, v = _gen(rnd, min(depth, 1) if rnd.random() < 0.5 else 0)
        if isinstance(v, int) and not isinstance(v, bool):
            return s, v


def _gen_bool(rnd, depth: int):
    (sa, va), (sb, vb) = _gen_int(rnd, depth), _gen_int(rnd, depth)
    return f"({sa} >= {sb})", va >= vb


def test_vrl_expressions_match_python(spark):
    import random

    rnd = random.Random(20260819)
    cases = [_gen(rnd, 3) for _ in range(120)]
    cols = []
    for i, (src, _) in enumerate(cases):
        cols.append(compile_expression(src).alias(f"c{i}"))
    row = spark.range(1).select(*cols).collect()[0]
    for i, (src, expect) in enumerate(cases):
        got = row[f"c{i}"]
        if isinstance(expect, float):
            assert got is not None and math.isclose(got, expect), (src, got)
        else:
            assert got == expect, (src, got, expect)
