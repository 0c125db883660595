"""Loki push-API (JSON) encoder (the ``loki`` sink's wire format).

Parity: reference ``src/sinks/loki/event.rs``:

- records group into streams by their SORTED label set; the grouping key
  is the flattened ``k1,v1,k2,v2,`` string with ``\\`` and ``,``
  backslash-escaped per element (LokiBatch::from, :85-107).
- each stream's values sort by timestamp (:124-125); entries serialize as
  ``["<ts_ns as string>", "<line>", {structured_metadata}]``
  (LokiEvent::serialize, :148-163 — the timestamp is a STRING of
  nanoseconds, and the metadata object is always present).
- the batch body is ``{"streams":[...]}`` (encode_input, :35-37).
- labels default to ``{"agent":"vector"}`` when empty (sink.rs:389-394).

Two orderings are nondeterministic in the reference (Rust HashMap
iteration: stream order in the body, label order inside ``stream``) — we
canonicalize both to sorted (by stream key / label key), which is also
what a distributed engine can reproduce. Value sort ties (same-ns
timestamps) break by line text for the same reason; the reference's
stable sort preserves arrival order, which has no distributed analog.

Pure column expressions; JSON string escaping of the log line rides
Spark's own ``to_json`` (single-element array, brackets stripped by
length arithmetic — never content matching).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _esc_key(s: Column) -> Column:
    """Stream-key element escaping: backslash before ``\\`` and ``,``."""
    return F.regexp_replace(s, r"([\\,])", r"\\$1")


def _json_str(s: Column) -> Column:
    """JSON-escaped, quoted string via to_json on a 1-element array
    (``["..."]`` → strip the brackets by position)."""
    arr = F.to_json(F.array(s))
    return F.substring(arr, 2, F.length(arr) - 2)


def stream_key(labels: Column) -> Column:
    """``k1,v1,k2,v2,`` grouping key over the SORTED label entries."""
    entries = F.array_sort(F.map_entries(labels))
    return F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(
                _esc_key(e["key"]), F.lit(","), _esc_key(e["value"]), F.lit(","),
            ),
        ),
        "",
    )


def loki_entry(ts_ns: Column, line: Column, metadata: Column | None = None) -> Column:
    """One ``values`` entry: ``["<ts_ns>", <line>, {metadata}]``."""
    meta = (
        F.to_json(metadata)
        if metadata is not None
        else F.lit("{}")
    )
    return F.concat(
        F.lit('["'), ts_ns.cast("long").cast("string"), F.lit('",'),
        _json_str(line), F.lit(","), meta, F.lit("]"),
    )


def loki_streams(
    df: DataFrame,
    labels_col: str = "labels",
    line_col: str = "line",
    ts_ns_col: str = "ts_ns",
    metadata_col: str | None = None,
) -> DataFrame:
    """Records → one row per stream: (stream_key, n_values, stream_json).

    ``stream_json`` is the full ``{"stream":{...},"values":[...]}`` block
    with labels sorted by key and values sorted by (ts_ns, entry). The
    groupBy shuffles (key, ts, line) — stream cardinality is label-set
    cardinality, the same boundedness contract the reference's in-memory
    HashMap batches rely on."""
    labels = F.coalesce(
        F.when(F.size(F.map_keys(F.col(labels_col))) > 0, F.col(labels_col)),
        F.create_map(F.lit("agent"), F.lit("vector")),
    )
    entry = loki_entry(
        F.col(ts_ns_col), F.col(line_col),
        F.col(metadata_col) if metadata_col else None,
    )
    base = df.select(
        stream_key(labels).alias("stream_key"),
        F.to_json(
            F.map_from_entries(F.array_sort(F.map_entries(labels)))
        ).alias("__labels_json"),
        F.col(ts_ns_col).cast("long").alias("__ts"),
        entry.alias("__entry"),
    )
    values = F.transform(
        F.array_sort(F.collect_list(F.struct("__ts", "__entry"))),
        lambda x: x["__entry"],
    )
    return (
        base.groupBy("stream_key", "__labels_json")
        .agg(values.alias("__values"))
        .select(
            "stream_key",
            F.size("__values").alias("n_values"),
            F.concat(
                F.lit('{"stream":'), F.col("__labels_json"),
                F.lit(',"values":['), F.array_join("__values", ","),
                F.lit("]}"),
            ).alias("stream_json"),
        )
    )


def push_bodies(streams: DataFrame, buckets: int = 16) -> DataFrame:
    """THE default push-request assembly: streams → one bounded request
    body per deterministic hash bucket, fully distributed (no driver
    collect anywhere in the path — loki label-set cardinality is the
    classic blow-up, so the body count scales with the stream dim
    instead of funnelling through the driver). Same batching contract
    as the body sinks in ``plans/sink_registry.py``: bucket =
    ``crc32(stream_key) % buckets``, streams sorted by key inside each
    bucket, body = ``{"streams":[...]}``. Returns
    (batch_id, n_streams, body)."""
    b = (F.crc32(F.col("stream_key")) % buckets).cast("int")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("stream_key", "stream_json"))),
        lambda x: x["stream_json"],
    )
    return (
        streams.groupBy(b.alias("batch_id"))
        .agg(ordered.alias("__s"))
        .select(
            "batch_id",
            F.size("__s").alias("n_streams"),
            F.concat(
                F.lit('{"streams":['), F.array_join("__s", ","), F.lit("]}")
            ).alias("body"),
        )
    )


def push_body(streams: DataFrame) -> str:
    """DEBUG-ONLY driver-side render of one global push request
    (streams in stream_key order) for small fixtures and tests. The
    production path is :func:`push_bodies` — this one collects and is
    bounded only by stream (label-set) cardinality."""
    rows = streams.orderBy("stream_key").collect()
    return '{"streams":[' + ",".join(r.stream_json for r in rows) + "]}"
