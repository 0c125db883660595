"""gcp_stackdriver_logs sink encoder — Cloud Logging entries.write bodies.

Parity: reference ``src/sinks/gcp/stackdriver/logs/encoder.rs``:

* each entry carries ``logName`` (``projects/<p>/logs/<id>`` — or the
  billingAccounts/folders/organizations variants, :103-117),
  ``jsonPayload`` (the remaining event object), ``severity``, ``resource``
  (``{type, labels}``), and ``timestamp`` when the event has one
  (chrono's serde default = RFC 3339 AutoSi);
* ``severity`` remaps via :118-152: integers floor to the nearest 100
  (LogSeverity enum values); strings parse numerically first, else match
  by uppercase prefix (EMERG/FATAL→800, ALERT→700, CRIT→600, ERR→500,
  WARN→400, NOTICE→300, INFO→200, DEBUG/TRACE→100, DEFAULT/unknown→0);
* the body is ``{"entries":[...]}`` (:158-180).

JSON objects render with sorted keys (serde_json's default Map is a
BTreeMap) — entry keys therefore order ``jsonPayload, logName, resource,
severity, timestamp``. Pure JVM column math; ``jsonPayload`` arrives as a
pre-encoded JSON object (the sinks/new_relic.py map convention or a
``to_json(struct)``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.native_json import _json_str, auto_si_timestamp

_PREFIX_SEVERITY = [
    (("EMERG", "FATAL"), 800), (("ALERT",), 700), (("CRIT",), 600),
    (("ERR",), 500), (("WARN",), 400), (("NOTICE",), 300),
    (("INFO",), 200), (("DEBUG", "TRACE"), 100),
]


def remap_severity(c: Column) -> Column:
    """encoder.rs remap_severity as a column expression."""
    s = c.cast("string")
    # the reference parses strings as usize — digits only; LogSeverity
    # integer values are non-negative, so the same gate serves int columns.
    n = F.when(s.rlike("^[0-9]+$"), c.cast("long"))
    up = F.upper(s)
    out = F.lit(0).cast("long")
    for prefixes, level in reversed(_PREFIX_SEVERITY):
        cond = F.lit(False)
        for p in prefixes:
            cond = cond | up.startswith(p)
        out = F.when(cond, F.lit(level).cast("long")).otherwise(out)
    # "ER" exact-match special case from the reference
    out = F.when(up == "ER", F.lit(500).cast("long")).otherwise(out)
    return F.when(n.isNotNull(), n - n % 100).otherwise(out)


def log_name(kind: str, parent: Column, log_id: Column) -> Column:
    """StackdriverLogName variants (:103-117)."""
    prefix = {
        "billing_account": "billingAccounts",
        "folder": "folders",
        "organization": "organizations",
        "project": "projects",
    }[kind]
    return F.concat(F.lit(prefix + "/"), parent, F.lit("/logs/"), log_id)


def encode_stackdriver_entry(
    log_name_col: Column,
    json_payload: Column,
    severity: Column,
    resource_type: Column,
    resource_labels: Column,
    ts: Column | None = None,
) -> Column:
    """One LogEntry object (sorted keys; see module doc)."""
    labels = F.to_json(
        F.map_from_entries(F.array_sort(F.map_entries(resource_labels)))
    )
    out = F.concat(
        F.lit('{"jsonPayload":'), json_payload,
        F.lit(',"logName":'), _json_str(log_name_col),
        F.lit(',"resource":{"labels":'), labels,
        F.lit(',"type":'), _json_str(resource_type), F.lit("}"),
        F.lit(',"severity":'), severity.cast("long").cast("string"),
    )
    if ts is not None:
        out = F.concat(
            out,
            F.when(
                ts.isNotNull(),
                F.concat(F.lit(',"timestamp":"'), auto_si_timestamp(ts),
                         F.lit('"')),
            ).otherwise(F.lit("")),
        )
    return F.concat(out, F.lit("}"))


def entries_body(objs: Column) -> Column:
    """Collected entries → ``{"entries":[...]}``."""
    return F.concat(
        F.lit('{"entries":['), F.array_join(objs, ","), F.lit("]}")
    )
