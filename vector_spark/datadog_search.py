"""Datadog search syntax → ``pyspark.sql.Column`` — the reference's second
predicate language.

Parity: reference src/conditions/datadog_search.rs (conditions are selected
by ``type`` at src/conditions/mod.rs:23-47: ``vrl`` or ``datadog_search``).
The grammar here is the PUBLIC Datadog log-search syntax subset the
reference's matcher implements:

- ``key:value`` facet equality; ``key:"quoted phrase"``
- wildcards: ``key:web*``, ``key:*error*`` (``*`` only)
- bare terms search the default field as substring: ``error``
- ``AND`` / ``OR`` / ``NOT`` (also ``-term`` negation); adjacency = AND
- comparisons: ``key:>5``, ``key:>=1.5`` …
- ranges: ``key:[2 TO 5]`` inclusive
- existence: ``_exists_:key`` / ``_missing_:key``
- grouping parens; ``@attr`` fields map to the column path minus ``@``
- ``*`` alone matches all documents (MatchAllDocs)

Everything compiles to built-in Column expressions — JVM-side, no Python
in the executor path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lpar>\() | (?P<rpar>\))
      | (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b)
      | (?P<neg>-)
      | (?P<range>(?P<rf>[@\w.]+):\[(?P<lo>[^\s\]]+)\s+TO\s+(?P<hi>[^\s\]]+)\])
      | (?P<cmp>(?P<cf>[@\w.]+):(?P<cop>>=|<=|>|<)(?P<cv>-?\d+(?:\.\d+)?))
      | (?P<facet>(?P<ff>[@\w.]+):(?P<fv>"(?:[^"\\]|\\.)*"|[^\s()]+))
      | (?P<star>\*(?=\s|$|\)))
      | (?P<term>"(?:[^"\\]|\\.)*"|[^\s()]+)
    )""",
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, re.Match]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"bad datadog-search syntax at: {q[pos:]!r}")
        pos = m.end()
        out.append((m.lastgroup, m))
    out.append(("eof", None))
    return out


def _field(name: str) -> Column:
    return F.col(name[1:] if name.startswith("@") else name)


def _unquote(v: str) -> str:
    if v.startswith('"') and v.endswith('"') and len(v) >= 2:
        return v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    return v


def _lit_of(v: str):
    if re.fullmatch(r"-?\d+", v):
        return F.lit(int(v))
    if re.fullmatch(r"-?\d+\.\d+", v):
        return F.lit(float(v))
    return None


def _like_pattern(v: str) -> str:
    # escape LIKE metacharacters, then map * → %
    esc = v.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    return esc.replace("*", "%")


class _Parser:
    def __init__(self, toks, default_field: str):
        self.toks = toks
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i][0]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Column:
        c = self.or_()
        if self.peek() != "eof":
            raise ValueError(f"trailing tokens in datadog-search query")
        return c

    def or_(self) -> Column:
        c = self.and_()
        while self.peek() == "or":
            self.next()
            c = c | self.and_()
        return c

    def and_(self) -> Column:
        c = self.unary()
        # explicit AND or adjacency (anything that can start a term)
        while True:
            k = self.peek()
            if k == "and":
                self.next()
                c = c & self.unary()
            elif k in ("not", "neg", "lpar", "range", "cmp", "facet", "star", "term"):
                c = c & self.unary()
            else:
                return c

    def unary(self) -> Column:
        k = self.peek()
        if k in ("not", "neg"):
            self.next()
            return ~self.unary()
        return self.primary()

    def primary(self) -> Column:
        kind, m = self.next()
        if kind == "lpar":
            c = self.or_()
            if self.next()[0] != "rpar":
                raise ValueError("unbalanced parens in datadog-search query")
            return c
        if kind == "star":
            return F.lit(True)  # MatchAllDocs
        if kind == "range":
            col = _field(m.group("rf"))
            lo, hi = m.group("lo"), m.group("hi")
            lo_l, hi_l = _lit_of(lo), _lit_of(hi)
            if lo_l is not None and hi_l is not None:
                col = col.cast("double")
                return (col >= lo_l) & (col <= hi_l)
            return (col >= F.lit(_unquote(lo))) & (col <= F.lit(_unquote(hi)))
        if kind == "cmp":
            col = _field(m.group("cf")).cast("double")
            v = F.lit(float(m.group("cv")))
            return {
                ">": col > v, ">=": col >= v, "<": col < v, "<=": col <= v,
            }[m.group("cop")]
        if kind == "facet":
            fname, raw = m.group("ff"), m.group("fv")
            if fname == "_exists_":
                return _field(_unquote(raw)).isNotNull()
            if fname == "_missing_":
                return _field(_unquote(raw)).isNull()
            col = _field(fname)
            v = _unquote(raw)
            if "*" in v and not raw.startswith('"'):
                return col.cast("string").like(_like_pattern(v))
            num = _lit_of(v) if not raw.startswith('"') else None
            if num is not None:
                return col == num
            return col == F.lit(v)
        if kind == "term":
            v = _unquote(m.group("term"))
            col = F.col(self.default_field)
            if "*" in v and not m.group("term").startswith('"'):
                return col.cast("string").like(_like_pattern(v))
            return col.cast("string").contains(F.lit(v))
        raise ValueError(f"unexpected token kind {kind}")


def compile_datadog_search(query: str, default_field: str = "message") -> Column:
    """Compile a Datadog search query to a boolean Column. Bare terms match
    ``default_field`` as substring (the reference's default-field search)."""
    q = query.strip()
    if not q:
        return F.lit(True)
    return _Parser(_lex(q), default_field).parse()
