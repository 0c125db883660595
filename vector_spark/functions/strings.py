"""VRL string functions → Column builders (all JVM built-ins).

Parity: reference website/cue/reference/remap/functions/ string category
(downcase, upcase, *case, contains, split, join, replace, truncate, slice,
strlen, redact, sieve, strip_*, ...). Only functions with no direct Spark
built-in get a composition here; trivial 1:1 mappings (lower/upper/length/
split/trim/...) are used directly from pyspark.sql.functions at call sites.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- case conversions --------------------------------------------------------


def _words(col: Column) -> Column:
    """Split an identifier into lowercase words (handles camelCase,
    snake_case, kebab-case, spaces)."""
    spaced = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2")
    spaced = F.regexp_replace(spaced, r"[_\-]+", " ")
    return F.split(F.lower(F.trim(spaced)), r"\s+")


def snakecase(col: Column) -> Column:
    return F.array_join(_words(col), "_")


def kebabcase(col: Column) -> Column:
    return F.array_join(_words(col), "-")


def screamingsnakecase(col: Column) -> Column:
    return F.upper(snakecase(col))


def camelcase(col: Column) -> Column:
    w = _words(col)
    rest = F.transform(F.slice(w, 2, 10_000), lambda s: F.initcap(s))
    return F.concat(F.element_at(w, 1), F.array_join(rest, ""))


def pascalcase(col: Column) -> Column:
    return F.array_join(F.transform(_words(col), lambda s: F.initcap(s)), "")


# --- edits -------------------------------------------------------------------


def truncate(col: Column, limit: int, suffix: str = "") -> Column:
    """truncate: cut to ``limit`` chars, appending ``suffix`` when cut."""
    cut = F.substring(col, 1, limit)
    return F.when(F.length(col) > limit, F.concat(cut, F.lit(suffix))).otherwise(col)


def slice_(col: Column, start: int, end: int | None = None) -> Column:
    """slice: python-ish [start, end) on characters; negative start OR end
    count from the end, as in VRL (slice.cue)."""
    n = F.length(col)
    s = F.lit(start) if start >= 0 else n + start
    e = n if end is None else (F.lit(end) if end >= 0 else n + end)
    s = F.greatest(s, F.lit(0))
    return F.substring(col, s + 1, F.greatest(e - s, F.lit(0)))


def strip_whitespace(col: Column) -> Column:
    return F.trim(col)


def strip_ansi_escape_codes(col: Column) -> Column:
    return F.regexp_replace(col, r"\x1b\[[0-9;]*[A-Za-z]", "")


def replace(col: Column, pattern: str, replacement: str, literal: bool = False) -> Column:
    if literal:
        import re as _re

        pattern = _re.escape(pattern)
    return F.regexp_replace(col, pattern, replacement)


def redact(col: Column, patterns: list[str], redactor: str = "[REDACTED]") -> Column:
    """redact: replace every match of each pattern with the redactor."""
    out = col
    for p in patterns:
        out = F.regexp_replace(out, p, redactor)
    return out


def sieve(col: Column, pattern: str, replace_with: str = "") -> Column:
    """sieve: keep ONLY substrings matching pattern; everything else →
    ``replace_with``."""
    return F.array_join(
        F.regexp_extract_all(col, F.lit(f"({pattern})"), F.lit(1)), replace_with
    )


# --- predicates / search -----------------------------------------------------


def contains_all(col: Column, needles: list[str]) -> Column:
    out = F.lit(True)
    for n in needles:
        out = out & col.contains(n)
    return out


def match_any(col: Column, patterns: list[str]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def find(col: Column, substr: str) -> Column:
    """find: index of first occurrence (−1 when absent, VRL semantics)."""
    return (F.instr(col, substr) - 1).cast("long")


def starts_with(col: Column, prefix: str, case_sensitive: bool = True) -> Column:
    if case_sensitive:
        return col.startswith(prefix)
    return F.lower(col).startswith(prefix.lower())


def ends_with(col: Column, suffix: str, case_sensitive: bool = True) -> Column:
    if case_sensitive:
        return col.endswith(suffix)
    return F.lower(col).endswith(suffix.lower())
