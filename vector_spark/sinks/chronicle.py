"""gcp_chronicle sink encoder — unstructuredlogentries:batchCreate bodies.

Parity: reference ``src/sinks/gcp_chronicle/chronicle_unstructured.rs``:

* Each event becomes ``{"log_text": <encoded event>}`` plus, when the
  event has a timestamp, ``"ts_rfc3339"`` rendered with
  ``SecondsFormat::AutoSi`` + Z (:371-396) — the shared
  :func:`vector_spark.functions.native_json.auto_si_timestamp` rendering.
* Requests partition on ``(log_type, namespace)`` (partitioner.rs — both
  are per-event templates); the body is ChronicleRequestBody's struct
  order ``customer_id, namespace?, labels?, log_type, entries``
  (:340-352, serde skips the Nones).

The 1 MB body cap (:96-100) maps to the batch key: callers chunk
oversized groups upstream (``F.floor(row_number/N)`` in the batch key),
exactly like the firehose request splitter. Pure JVM column math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.native_json import _json_str, auto_si_timestamp


def chronicle_entry(log_text: Column, ts: Column | None = None) -> Column:
    """One unstructured log entry object."""
    out = F.concat(F.lit('{"log_text":'), _json_str(log_text))
    if ts is not None:
        out = F.concat(
            out,
            F.when(
                ts.isNotNull(),
                F.concat(F.lit(',"ts_rfc3339":"'), auto_si_timestamp(ts),
                         F.lit('"')),
            ).otherwise(F.lit("")),
        )
    return F.concat(out, F.lit("}"))


def chronicle_body(
    customer_id: str,
    log_type: Column,
    entries: Column,
    namespace: Column | None = None,
    labels_json: str | None = None,
) -> Column:
    """ChronicleRequestBody in struct order. ``entries`` is the collected
    entry array (``F.sort_array(F.collect_list(...))`` — arrival order
    has no distributed analog); ``labels_json`` is a pre-encoded constant
    array like ``[{"key":"env","value":"prod"}]``."""
    body = F.concat(F.lit('{"customer_id":'), _json_str(F.lit(customer_id)))
    if namespace is not None:
        body = F.concat(
            body,
            F.when(
                namespace.isNotNull(),
                F.concat(F.lit(',"namespace":'), _json_str(namespace)),
            ).otherwise(F.lit("")),
        )
    if labels_json is not None:
        body = F.concat(body, F.lit(',"labels":'), F.lit(labels_json))
    return F.concat(
        body,
        F.lit(',"log_type":'), _json_str(log_type),
        F.lit(',"entries":['), F.array_join(entries, ","), F.lit("]}"),
    )
