"""Predicate surface: a VRL-subset condition compiler → ``pyspark.sql.Column``.

The reference's conditions (reference src/conditions/mod.rs:23-47) are VRL
boolean expressions evaluated per event; they must not mutate the event.
Here a condition is either (a) a ready-made ``Column``, (b) a Python callable
``DataFrame -> Column``, or (c) a string in a small VRL-like grammar compiled
by :func:`compile_condition`:

    expr    := or
    or      := and ("||" and)*
    and     := not ("&&" not)*
    not     := "!" not | cmp
    cmp     := term (("=="|"!="|">="|"<="|">"|"<") term)?
    term    := path | literal | func "(" args ")" | "(" expr ")"
    path    := "." ident ("." ident)*          -- field access (nested via dots)
    func    := exists | contains | starts_with | ends_with | match | is_null

Examples: ``.status >= 500``, ``exists(.user) && !contains(.msg, "debug")``,
``match(.message, "^ERROR")``.

Everything compiles to built-in Column expressions — JVM-side, codegen'd, no
Python in the executor hot path.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ConditionLike = Column | str | dict | Callable[[DataFrame], Column]


def to_column(cond: ConditionLike, df: DataFrame | None = None) -> Column:
    """Plain strings compile as VRL-subset conditions; dicts select the
    language like the reference's config shape (src/conditions/mod.rs:23-47):
    ``{"type": "vrl" | "datadog_search", "source": "..."}``."""
    if isinstance(cond, Column):
        return cond
    if isinstance(cond, dict):
        kind = cond.get("type", "vrl")
        if kind == "vrl":
            # the full VRL expression compiler (local vars, if-expressions,
            # stdlib calls) — the reference's native condition language
            from vector_spark.vrl import compile_expression

            return compile_expression(
                cond["source"],
                dict(df.dtypes) if df is not None else None,
            )
        if kind in ("is_log", "is_metric"):
            # event-kind checks (conditions/mod.rs): on a typed engine the
            # kind is a property of the FRAME — metric frames carry the
            # metric shape columns
            if df is None:
                raise ValueError(f"{kind} condition needs a DataFrame")
            cols = set(df.columns)
            metricish = {"name", "kind"} <= cols and cols & {
                "counter", "gauge", "set", "distribution", "histogram",
                "summary", "value",
            }
            return F.lit(bool(metricish) == (kind == "is_metric"))
        if kind == "datadog_search":
            from vector_spark.datadog_search import compile_datadog_search

            return compile_datadog_search(
                cond["source"], cond.get("default_field", "message")
            )
        raise ValueError(f"unknown condition type {kind!r}")
    if callable(cond):
        if df is None:
            raise ValueError("callable condition needs a DataFrame")
        return cond(df)
    return compile_condition(cond)


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<op>\|\||&&|==|!=|>=|<=|>|<|!|\(|\)|,)
      | (?P<path>\.[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_FUNCS = {"exists", "contains", "starts_with", "ends_with", "match", "is_null"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad condition syntax at: {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        kind, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    def parse(self) -> Column:
        c = self.or_()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return c

    def or_(self) -> Column:
        c = self.and_()
        while self.peek()[1] == "||":
            self.next()
            c = c | self.and_()
        return c

    def and_(self) -> Column:
        c = self.not_()
        while self.peek()[1] == "&&":
            self.next()
            c = c & self.not_()
        return c

    def not_(self) -> Column:
        if self.peek()[1] == "!":
            self.next()
            return ~self.not_()
        return self.cmp()

    def cmp(self) -> Column:
        left = self.term()
        op = self.peek()[1]
        if op in ("==", "!=", ">=", "<=", ">", "<"):
            self.next()
            right = self.term()
            return {
                "==": left == right, "!=": left != right,
                ">=": left >= right, "<=": left <= right,
                ">": left > right, "<": left < right,
            }[op]
        return left

    def term(self) -> Column:
        kind, val = self.next()
        if val == "(":
            c = self.or_()
            self.expect(")")
            return c
        if kind == "path":
            return F.col(val[1:])
        if kind == "str":
            return F.lit(val[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if kind == "num":
            return F.lit(float(val) if "." in val else int(val))
        if kind == "word":
            if val in ("true", "false"):
                return F.lit(val == "true")
            if val == "null":
                return F.lit(None)
            if self.peek()[1] == "(":
                self.expect("(")
                args = []
                while self.peek()[1] != ")":
                    args.append(self.or_())
                    if self.peek()[1] == ",":
                        self.next()
                self.expect(")")
                if val in _FUNCS:
                    return self._call(val, args)
                # fall back to the VRL stdlib registry (vector_spark.vrl) —
                # conditions share the transform language's function surface
                from vector_spark.vrl import VrlCompileError, _lookup, _Val

                try:
                    fn = _lookup(val.rstrip("!"))
                except VrlCompileError:
                    raise ValueError(f"unknown function {val!r}") from None
                return fn([_Val(a) for a in args], {})
            raise ValueError(f"unknown identifier {val!r}")
        raise ValueError(f"unexpected token {val!r}")

    @staticmethod
    def _call(name: str, args: list[Column]) -> Column:
        if name == "exists":
            return args[0].isNotNull()
        if name == "is_null":
            return args[0].isNull()
        if name == "contains":
            return args[0].contains(args[1])
        if name == "starts_with":
            return args[0].startswith(args[1])
        if name == "ends_with":
            return args[0].endswith(args[1])
        if name == "match":
            return F.regexp_like(args[0], args[1])
        raise AssertionError(name)


def compile_condition(expr: str) -> Column:
    """Compile a VRL-subset condition string to a boolean Column."""
    return _Parser(_tokenize(expr)).parse()
