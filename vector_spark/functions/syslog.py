"""VRL syslog helpers: to_syslog_facility / to_syslog_level /
to_syslog_severity — small literal map lookups (reference
website/cue/reference/remap/functions/to_syslog_*.cue).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]

LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]


def _lookup(pairs: dict) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(pairs.items())])


def to_syslog_facility(code: Column) -> Column:
    """facility code (0-23) → keyword."""
    return F.element_at(_lookup(dict(enumerate(FACILITIES))), code.cast("int"))


def to_syslog_level(severity: Column) -> Column:
    """severity code (0-7) → level keyword."""
    return F.element_at(_lookup(dict(enumerate(LEVELS))), severity.cast("int"))


def to_syslog_severity(level: Column) -> Column:
    """level keyword → severity code (0-7)."""
    return F.element_at(
        _lookup({name: i for i, name in enumerate(LEVELS)}), F.lower(level)
    ).cast("int")
