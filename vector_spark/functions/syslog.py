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


def encode_syslog_3164(
    ts: Column,
    hostname: Column,
    process: Column,
    message: Column,
    pid: Column | None = None,
    facility: Column | int = 1,
    severity: Column | int = 6,
) -> Column:
    """RFC 3164 / BSD syslog line: ``<pri>Mmm dd hh:mm:ss host tag[pid]:
    msg`` — the papertrail sink's wire format (reference
    src/sinks/papertrail.rs:159-176: Formatter3164 with facility
    LOG_USER and severity LOG_INFO around the encoded message; pri =
    facility*8 + severity). Day-of-month is space-padded per the RFC.
    Round-trips through ``parse.parse_bsd_syslog``."""
    fac = facility if isinstance(facility, Column) else F.lit(facility)
    sev = severity if isinstance(severity, Column) else F.lit(severity)
    pri = (fac.cast("int") * 8 + sev.cast("int")).cast("string")
    stamp = F.concat(
        F.date_format(ts, "MMM"), F.lit(" "),
        F.lpad(F.dayofmonth(ts).cast("string"), 2, " "), F.lit(" "),
        F.date_format(ts, "HH:mm:ss"),
    )
    proc = (
        process
        if pid is None
        else F.concat(
            process,
            F.when(
                pid.isNotNull(),
                F.concat(F.lit("["), pid.cast("string"), F.lit("]")),
            ).otherwise(F.lit("")),
        )
    )
    return F.concat(
        F.lit("<"), pri, F.lit(">"), stamp, F.lit(" "), hostname,
        F.lit(" "), proc, F.lit(": "), message,
    )
