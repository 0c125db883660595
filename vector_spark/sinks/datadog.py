"""Datadog logs-intake encoder (the ``datadog_logs`` sink's wire format).

Parity: reference ``src/sinks/datadog/logs/sink.rs``:

- ``normalize_event`` (:98-137): the six reserved semantic attributes
  move to the event root under their intake names
  (``src/common/datadog.rs:24-31`` — status, timestamp, hostname,
  service, ddsource, ddtags); an array-valued ``ddtags`` re-joins to a
  comma-delimited string (:115-127); a timestamp value becomes integer
  epoch milliseconds (:132-136);
- the request body is a JSON array of the normalized events; a
  LogEvent's object map is ordered (BTreeMap), so fields serialize in
  sorted-key order — reproduced here with ``array_sort`` over the
  field entries.

Pure column expressions; string escaping rides Spark's ``to_json``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _json_str(s: Column) -> Column:
    arr = F.to_json(F.array(s))
    return F.substring(arr, 2, F.length(arr) - 2)


def normalize_ddtags(tags: Column) -> Column:
    """Array-valued ddtags → comma-delimited string (sink.rs:115-127)."""
    return F.array_join(tags, ",")


def encode_datadog_log(
    message: Column,
    ts_ms: Column,
    status: Column | None = None,
    hostname: Column | None = None,
    service: Column | None = None,
    ddsource: Column | None = None,
    ddtags: Column | None = None,
    attributes: Column | None = None,
) -> Column:
    """One normalized intake event as a JSON object with sorted keys.

    Reserved fields are omitted when NULL; ``attributes`` is a
    map<string,string> of the remaining event fields, merged at the
    root exactly like the reference's flat LogEvent."""
    def ent(key: str, val_json: Column, guard: Column) -> Column:
        return F.when(
            guard,
            F.struct(
                F.lit(key).alias("key"),
                F.concat(F.lit(f'"{key}":'), val_json).alias("kv"),
            ),
        )

    fixed = [
        ent("message", _json_str(message), message.isNotNull()),
        ent("timestamp", ts_ms.cast("string"), ts_ms.isNotNull()),
    ]
    for key, col in (
        ("status", status),
        ("hostname", hostname),
        ("service", service),
        ("ddsource", ddsource),
        ("ddtags", ddtags),
    ):
        if col is not None:
            fixed.append(ent(key, _json_str(col), col.isNotNull()))
    entries = F.filter(F.array(*fixed), lambda e: e.isNotNull())
    if attributes is not None:
        extra = F.transform(
            F.map_entries(attributes),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.concat(
                    _json_str(e["key"]), F.lit(":"), _json_str(e["value"])
                ).alias("kv"),
            ),
        )
        entries = F.concat(entries, F.coalesce(extra, F.array()))
    body = F.array_join(
        F.transform(F.array_sort(entries), lambda e: e["kv"]), ","
    )
    return F.concat(F.lit("{"), body, F.lit("}"))
