"""journald source decode (``journalctl --output=json`` records).

Parity: reference ``src/sources/journald.rs``:

- input is newline-framed JSON, one flat string-field object per journal
  entry (make_command --output=json, journald.rs:679; decode_record:858);
- unit include/exclude lists merge into field matches on ``_SYSTEMD_UNIT``
  after ``fixup_unit`` (a unit with no ``.`` gets ``.service`` appended,
  journald.rs:~850, merged_include_matches:237-242);
- a record is dropped per the filter_matches truth table
  (journald.rs:912-919): with includes present a record must match one
  include pair; any exclude pair match always drops;
- ``contains_match``: ANY configured (field, value) pair equal to the
  record's field;
- legacy event mapping (enrich_log_event:737-805): ``host`` ←
  ``_HOSTNAME`` (removed from fields), ``timestamp`` ←
  ``_SOURCE_REALTIME_TIMESTAMP`` else ``__REALTIME_TIMESTAMP``
  (microsecond strings → timestamp, ts/1e6 s + µs remainder),
  ``message`` ← ``MESSAGE``, ``cursor`` ← ``__CURSOR`` (the checkpoint
  key — our resume analog is the manifest checkpointer);
- ``remap_priority`` (journald.rs:~884): numeric-string PRIORITY →
  EMERG/ALERT/CRIT/ERR/WARNING/NOTICE/INFO/DEBUG, else UNKNOWN.

Scoped out: journalctl's array-of-bytes encoding for non-UTF8 field
values (decode_array, journald.rs:872-880) — a map<string,string> column
cannot hold it; the reference lossy-decodes to a string anyway, and such
fields are rare enough that a pre-pass regex rewrite is the documented
route if ever needed. Pure JVM columns throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRIORITY_NAMES = (
    "EMERG", "ALERT", "CRIT", "ERR", "WARNING", "NOTICE", "INFO", "DEBUG",
)


def fixup_unit(unit: str) -> str:
    """Unit names with no ``.`` get ``.service`` appended."""
    return unit if "." in unit else f"{unit}.service"


def _remap_priority(p: Column) -> Column:
    """Numeric-string PRIORITY → syslog level keyword (non-numeric values
    pass through unchanged, matching the reference's parse-or-leave)."""
    num = p.try_cast("int")  # non-numeric → NULL under ANSI mode
    out = F.lit("UNKNOWN")
    for i, name in reversed(list(enumerate(PRIORITY_NAMES))):
        out = F.when(num == i, F.lit(name)).otherwise(out)
    return F.when(num.isNull(), p).otherwise(out)


def _contains_match(
    rec: Column, matches: dict[str, list[str]]
) -> Column:
    """ANY configured (field, value) pair present in the record."""
    cond = F.lit(False)
    for field, values in sorted(matches.items()):
        # a record lacking the field yields NULL from isin — that is
        # "no match" (the reference compares Option<&str>), not unknown
        cond = cond | F.coalesce(rec[field].isin(values), F.lit(False))
    return cond


def _merge_units(
    matches: dict[str, list[str]] | None, units: list[str] | tuple[str, ...]
) -> dict[str, list[str]]:
    merged = {k: list(v) for k, v in (matches or {}).items()}
    if units:
        merged.setdefault("_SYSTEMD_UNIT", []).extend(
            fixup_unit(u) for u in units
        )
    return merged


def parse_journald(
    df: DataFrame,
    line: str | Column = "value",
    include_units: list[str] | tuple[str, ...] = (),
    exclude_units: list[str] | tuple[str, ...] = (),
    include_matches: dict[str, list[str]] | None = None,
    exclude_matches: dict[str, list[str]] | None = None,
    remap_priority: bool = True,
) -> DataFrame:
    """Decode journalctl JSON lines into events: ``message``, ``host``,
    ``timestamp``, ``cursor``, plus the remaining journal fields as a
    ``fields`` map (PRIORITY remapped when asked)."""
    col = F.col(line) if isinstance(line, str) else line
    rec = F.from_json(col, "map<string,string>")
    parsed = df.select(rec.alias("__rec")).filter(
        F.col("__rec").isNotNull()
    )
    rec = F.col("__rec")

    includes = _merge_units(include_matches, include_units)
    excludes = _merge_units(exclude_matches, exclude_units)
    # filter_matches truth table (journald.rs:912-919) — keep = NOT drop
    if includes:
        parsed = parsed.filter(_contains_match(rec, includes))
    if excludes:
        parsed = parsed.filter(~_contains_match(rec, excludes))

    # try_cast: a malformed timestamp yields NULL instead of failing the
    # job under ANSI mode (reference: parse::<u64>().ok())
    ts_us = F.coalesce(
        rec["_SOURCE_REALTIME_TIMESTAMP"], rec["__REALTIME_TIMESTAMP"]
    ).try_cast("long")
    prio = (
        _remap_priority(rec["PRIORITY"])
        if remap_priority
        else rec["PRIORITY"]
    )
    # fields = record minus the promoted host key (legacy removes
    # _HOSTNAME from the event), with PRIORITY remapped in place
    fields = F.map_filter(
        rec, lambda k, _: ~k.isin("_HOSTNAME", "PRIORITY")
    )
    fields = F.when(
        rec["PRIORITY"].isNotNull(),
        F.map_concat(fields, F.create_map(F.lit("PRIORITY"), prio)),
    ).otherwise(fields)
    return parsed.select(
        rec["MESSAGE"].alias("message"),
        rec["_HOSTNAME"].alias("host"),
        F.timestamp_micros(ts_us).alias("timestamp"),
        rec["__CURSOR"].alias("cursor"),
        fields.alias("fields"),
    )
