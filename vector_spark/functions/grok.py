"""Grok support: pattern-macro expansion on the driver, regex execution on
executors.

Parity: VRL ``parse_grok``/``parse_groks`` (reference
website/cue/reference/remap/functions/parse_grok.cue). Grok is a macro
language over named-capture regexes: ``%{PATTERN:field}`` expands
recursively into ``(?<field>...)``. We expand ONCE on the driver
(:func:`grok_to_regex`), then execute either
- fast path: one JVM-side ``regexp_extract`` per field (whole-stage
  codegen, zero Python), or
- batch path: a single vectorized pandas UDF returning a struct (one regex
  pass per row instead of one per field) — preferable when a pattern has
  many fields.

The built-in pattern base covers the classic grok core used by the
reference's bundled patterns (logstash-compatible names, public knowledge).
"""

from __future__ import annotations

import re
from functools import partial

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Classic grok base patterns (logstash-compatible subset; public knowledge).
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~.]+",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "HOST": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b)",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
    "QS": r'"(?:[^"\\]|\\.)*"',
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "LOGLEVEL": r"(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Nn]otice|NOTICE|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+@[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*",
    "SYSLOGTIMESTAMP": r"\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "PATH": r"(?:/[^\s?#]*)+",
    "URIPATH": r"(?:/[^\s?#]*)*",
    "URIPARAM": r"\?[^\s#]*",
    "METHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


def grok_to_regex(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Expand a grok pattern into (python-regex, captured field names)."""
    patterns = {**BASE_PATTERNS, **(extra_patterns or {})}
    fields: list[str] = []

    def sub(m: re.Match, depth: int = 0) -> str:
        name, field = m.group(1), m.group(2)
        if name not in patterns:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = patterns[name]
        # recursive expansion (grok patterns may reference other patterns)
        for _ in range(10):
            if not _GROK_REF.search(body):
                break
            body = _GROK_REF.sub(lambda mm: sub(mm), body)
        if field:
            safe = re.sub(r"\W", "_", field)
            fields.append(field)
            return f"(?P<{safe}>{body})"
        return f"(?:{body})"

    regex = _GROK_REF.sub(sub, pattern)
    return regex, fields


def _java_named(regex: str) -> str:
    """Convert ``(?P<name>...)`` → Java's ``(?<name>...)`` for JVM regexes."""
    return regex.replace("(?P<", "(?<")


def grok_extract_fast(col: Column, pattern: str, extra: dict[str, str] | None = None) -> Column:
    """Fast path: struct of JVM-side ``regexp_extract`` per field.

    One regex evaluation per field — fine for ≤4 fields; for wide patterns
    use :func:`grok_extract` (single pass per row via pandas UDF).
    Misses yield NULL (each ``regexp_extract`` is wrapped in ``nullif``)
    so both strategies honor the module contract — an ``error_when``
    condition like ``is_null(.field)`` behaves identically regardless of
    which strategy ``parse_grok`` picked.
    """
    regex, fields = grok_to_regex(pattern, extra)
    jre = _java_named(regex)
    # group index of each named field = order of opening parens
    idx, out = 0, {}
    group_order: list[str] = []
    i = 0
    while i < len(regex):
        if regex[i] == "(" and (i == 0 or regex[i - 1] != "\\"):
            if regex[i : i + 4] == "(?P<":
                idx += 1
                name = regex[i + 4 : regex.index(">", i)]
                group_order.append(name)
                out[name] = idx
            elif regex[i : i + 2] != "(?":
                idx += 1
        i += 1
    return F.struct(
        *[
            F.nullif(
                F.regexp_extract(col, jre, out[re.sub(r"\W", "_", f)]), F.lit("")
            ).alias(f)
            for f in fields
        ]
    )


def grok_extract(col: Column, pattern: str, extra: dict[str, str] | None = None) -> Column:
    """Batch path: one vectorized pandas UDF doing a single `str.extract`
    pass per Arrow batch; returns struct<field:string,...> (nulls on miss)."""
    regex, fields = grok_to_regex(pattern, extra)
    safe_fields = [re.sub(r"\W", "_", f) for f in fields]
    schema = ", ".join(f"`{f}`: string" for f in fields)
    compiled = re.compile(regex)

    @pandas_udf(f"struct<{schema}>")
    def _extract(s: pd.Series) -> pd.DataFrame:
        ext = s.str.extract(compiled)
        ext = ext[safe_fields]
        ext.columns = fields
        return ext

    return _extract(col)


def parse_grok(col: Column, pattern: str, extra: dict[str, str] | None = None,
               fast_threshold: int = 4) -> Column:
    """parse_grok: pick the fast (per-field JVM regex) or batch (single-pass
    pandas) strategy by field count."""
    _, fields = grok_to_regex(pattern, extra)
    if len(fields) <= fast_threshold:
        return grok_extract_fast(col, pattern, extra)
    return grok_extract(col, pattern, extra)
