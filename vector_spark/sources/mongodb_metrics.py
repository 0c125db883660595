"""mongodb_metrics source — serverStatus documents → metric frame.

Parity: reference ``src/sources/mongodb_metrics/mod.rs:276-972`` (the
``collect_server_status`` emission list) and ``types.rs`` (the BSON/JSON
field names, camelCase per serde). The reference polls ``serverStatus``
over a live connection; the engine-shaped analog takes a DataFrame with
a column of serverStatus JSON documents (CDC dump / exporter output /
``mongosh --eval`` capture) and applies the exact name/kind/tag map:

* ``asserts`` → ``asserts_total`` counters tagged ``type``;
* ``connections`` → ``connections`` counters tagged ``state``;
* ``extra_info`` / instance (flattened uptime/localTime) gauges;
* ``mem`` → ``memory`` gauges tagged ``type`` (optional mapped fields
  skipped when absent);
* ``globalLock`` → total-time counter + active-client / current-queue
  gauges tagged ``type``;
* ``locks`` (map) → ``mongod_locks_time_acquiring_global_seconds_total``
  counters tagged ``type`` (lock name) + ``mode`` (read/write);
* ``metrics.*`` → the cursor/document/getLastError/operation/
  queryExecutor/record/repl/ttl counter-gauge families (``totalMillis``
  fields carry the reference's truncating i64 ``/1000``);
* ``opLatencies`` (map) → per-type histogram-bucket gauges (tag
  ``micros`` = bucket bound as string) + latency/ops gauges;
* ``storageEngine`` → ``mongod_storage_engine`` gauge 1 tagged
  ``engine``;
* ``wiredTiger`` (optional) → the full block-manager/cache/
  concurrent-transactions/log/session/transaction family, including the
  reference's quirks kept verbatim: ``cache_bytes_total`` reads the
  page counters (mod.rs:738-748) and ``cache_pages_total`` reuses them
  with read/write tags (mod.rs:773-783);
* ``network`` → byte/request counters tagged ``state``;
* ``opcounters`` → ``op_counters_repl_total`` and ``opcountersRepl`` →
  ``op_counters_total`` (the reference's swapped names at
  mod.rs:953-969, kept verbatim);
* plus the ``up`` gauge = 1 per successfully parsed document
  (mod.rs:243-263).

Typed ``from_json`` + bounded explode — zero Python in the plan, same
shape as sources/ecs_metrics.py. Absent optional sections yield null
values and are filtered out, matching the reference's version-gated
``Option<>`` fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MILLIS = "struct<num: bigint, totalMillis: bigint>"
_GLI = "struct<total: bigint, readers: bigint, writers: bigint>"
_CCT = "struct<`out`: bigint, available: bigint, totalTickets: bigint>"

SERVER_STATUS_SCHEMA = f"""struct<
  uptime: double, uptimeEstimate: bigint, localTime: bigint,
  asserts: struct<regular: bigint, warning: bigint, msg: bigint,
                  user: bigint, rollovers: bigint>,
  connections: struct<active: bigint, available: bigint, current: bigint>,
  extra_info: struct<heap_usage_bytes: bigint, page_faults: bigint>,
  mem: struct<resident: bigint, virtual: bigint, mapped: bigint,
              mappedWithJournal: bigint>,
  globalLock: struct<totalTime: bigint, activeClients: {_GLI},
                     currentQueue: {_GLI}>,
  locks: map<string, struct<
    timeAcquiringMicros: struct<r: bigint, w: bigint>>>,
  metrics: struct<
    cursor: struct<timedOut: bigint,
      open: struct<noTimeout: bigint, pinned: bigint, total: bigint>>,
    document: struct<deleted: bigint, inserted: bigint, returned: bigint,
                     updated: bigint>,
    getLastError: struct<wtime: {_MILLIS}, wtimeouts: bigint>,
    operation: struct<scanAndOrder: bigint, writeConflicts: bigint>,
    queryExecutor: struct<scanned: bigint, scannedObjects: bigint,
                          collectionScans: struct<total: bigint>>,
    record: struct<moves: bigint>,
    repl: struct<
      apply: struct<batches: {_MILLIS}, ops: bigint>,
      buffer: struct<count: bigint, maxSizeBytes: bigint,
                     sizeBytes: bigint>,
      executor: struct<queues: struct<networkInProgress: bigint,
                                      sleepers: bigint>,
                       unsignaledEvents: bigint>,
      network: struct<bytes: bigint, getmores: {_MILLIS}, ops: bigint,
                      readersCreated: bigint>>,
    ttl: struct<deletedDocuments: bigint, passes: bigint>>,
  opLatencies: map<string, struct<latency: bigint, ops: bigint,
    histogram: array<struct<micros: bigint, count: bigint>>>>,
  storageEngine: struct<name: string>,
  wiredTiger: struct<
    `block-manager`: struct<`blocks pre-loaded`: bigint,
      `blocks read`: bigint, `blocks written`: bigint,
      `bytes read`: bigint, `bytes written`: bigint,
      `mapped blocks read`: bigint, `mapped bytes read`: bigint>,
    cache: struct<`bytes currently in the cache`: bigint,
      `maximum bytes configured`: double,
      `modified pages evicted`: bigint,
      `pages currently held in the cache`: bigint,
      `pages read into cache`: bigint, `pages written from cache`: bigint,
      `percentage overhead`: bigint,
      `tracked bytes belonging to internal pages in the cache`: bigint,
      `tracked bytes belonging to leaf pages in the cache`: bigint,
      `tracked dirty bytes in the cache`: bigint,
      `tracked dirty pages in the cache`: bigint,
      `unmodified pages evicted`: bigint>,
    concurrentTransactions: struct<write: {_CCT}, read: {_CCT}>,
    log: struct<`log bytes of payload data`: bigint,
      `log bytes written`: bigint, `log flush operations`: bigint,
      `log records compressed`: bigint,
      `log records not compressed`: bigint, `log scan operations`: bigint,
      `log scan records requiring two reads`: bigint,
      `log sync operations`: bigint, `log sync_dir operations`: bigint,
      `log write operations`: bigint,
      `records processed by log scan`: bigint>,
    session: struct<`open session count`: bigint>,
    transaction: struct<`transaction begins`: bigint,
      `transaction checkpoints`: bigint,
      `transaction checkpoint currently running`: bigint,
      `transaction checkpoint max time (msecs)`: bigint,
      `transaction checkpoint min time (msecs)`: bigint,
      `transaction checkpoint total time (msecs)`: bigint,
      `transactions committed`: bigint,
      `transactions rolled back`: bigint>>,
  network: struct<bytesIn: bigint, bytesOut: bigint, numRequests: bigint>,
  opcounters: map<string, bigint>,
  opcountersRepl: map<string, bigint>,
  _corrupt_record: string>"""


def _div1000(c: Column) -> Column:
    """Rust's truncating i64 `/ 1000` (values here are non-negative)."""
    return (c.cast("double") / F.lit(1000.0)).cast("long")


def parse_server_status(df: DataFrame, col: str = "body",
                        namespace: str = "mongodb") -> DataFrame:
    """serverStatus JSON documents (one per row) → long metric frame
    (columns appended: ``name, namespace, kind, metric_type, tags,
    value``; ``tags`` is ``map<string,string>``)."""
    parsed = df.select(
        "*",
        F.from_json(
            F.col(col), SERVER_STATUS_SCHEMA,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_s"),
    )
    s = F.col("_s")
    no_tags = F.expr("cast(map() as map<string,string>)")

    def tags(**kv: str) -> Column:
        pairs: list[Column] = []
        for k, v in kv.items():
            pairs += [F.lit(k), F.lit(v)]
        return F.create_map(*pairs) if pairs else no_tags

    def entry(name: str, mtype: str, tag_col: Column,
              value: Column) -> Column:
        return F.struct(
            F.lit(name).alias("name"), F.lit(mtype).alias("metric_type"),
            tag_col.alias("tags"), value.cast("double").alias("value"),
        )

    m = s["metrics"]
    wt = s["wiredTiger"]
    bm, cache = wt["block-manager"], wt["cache"]
    cct, log, txn = wt["concurrentTransactions"], wt["log"], wt[
        "transaction"]

    fixed: list[Column] = [
        # collect() preamble: up gauge per scraped endpoint (mod.rs:263);
        # 0 when the document fails to parse, like a failed collection
        entry("up", "gauge", no_tags,
              F.when(s.isNull() | s["_corrupt_record"].isNotNull(),
                     F.lit(0)).otherwise(F.lit(1))),
    ]
    for t in ("regular", "warning", "msg", "user", "rollovers"):
        fixed.append(entry("asserts_total", "counter", tags(type=t),
                           s["asserts"][t]))
    for st in ("active", "available", "current"):
        fixed.append(entry("connections", "counter", tags(state=st),
                           s["connections"][st]))
    fixed += [
        entry("extra_info_heap_usage_bytes", "gauge", no_tags,
              s["extra_info"]["heap_usage_bytes"]),
        entry("extra_info_page_faults", "gauge", no_tags,
              s["extra_info"]["page_faults"]),
        entry("instance_local_time", "gauge", no_tags,
              _div1000(s["localTime"])),
        entry("instance_uptime_estimate_seconds_total", "gauge", no_tags,
              s["uptimeEstimate"]),
        entry("instance_uptime_seconds_total", "gauge", no_tags,
              s["uptime"]),
        entry("memory", "gauge", tags(type="resident"),
              s["mem"]["resident"]),
        entry("memory", "gauge", tags(type="virtual"),
              s["mem"]["virtual"]),
        entry("memory", "gauge", tags(type="mapped"), s["mem"]["mapped"]),
        entry("memory", "gauge", tags(type="mapped_with_journal"),
              s["mem"]["mappedWithJournal"]),
        entry("mongod_global_lock_total_time_seconds", "counter", no_tags,
              s["globalLock"]["totalTime"]),
    ]
    for grp, name in (("activeClients", "mongod_global_lock_active_clients"),
                      ("currentQueue", "mongod_global_lock_current_queue")):
        for t in ("total", "readers", "writers"):
            fixed.append(entry(name, "gauge", tags(type=t),
                               s["globalLock"][grp][t]))
    fixed += [
        entry("mongod_metrics_cursor_timed_out_total", "counter", no_tags,
              m["cursor"]["timedOut"]),
        entry("mongod_metrics_cursor_open", "gauge",
              tags(state="no_timeout"), m["cursor"]["open"]["noTimeout"]),
        entry("mongod_metrics_cursor_open", "gauge", tags(state="pinned"),
              m["cursor"]["open"]["pinned"]),
        entry("mongod_metrics_cursor_open", "gauge", tags(state="total"),
              m["cursor"]["open"]["total"]),
    ]
    for st in ("deleted", "inserted", "returned", "updated"):
        fixed.append(entry("mongod_metrics_document_total", "counter",
                           tags(state=st), m["document"][st]))
    gle = m["getLastError"]
    fixed += [
        entry("mongod_metrics_get_last_error_wtime_num", "gauge", no_tags,
              gle["wtime"]["num"]),
        entry("mongod_metrics_get_last_error_wtime_seconds_total",
              "counter", no_tags, _div1000(gle["wtime"]["totalMillis"])),
        entry("mongod_metrics_get_last_error_wtimeouts_total", "counter",
              no_tags, gle["wtimeouts"]),
        entry("mongod_metrics_operation_total", "counter",
              tags(type="scan_and_order"), m["operation"]["scanAndOrder"]),
        entry("mongod_metrics_operation_total", "counter",
              tags(type="write_conflicts"),
              m["operation"]["writeConflicts"]),
        entry("mongod_metrics_query_executor_total", "counter",
              tags(state="scanned"), m["queryExecutor"]["scanned"]),
        entry("mongod_metrics_query_executor_total", "counter",
              tags(state="scanned_objects"),
              m["queryExecutor"]["scannedObjects"]),
        entry("mongod_metrics_query_executor_total", "counter",
              tags(state="collection_scans"),
              m["queryExecutor"]["collectionScans"]["total"]),
        entry("mongod_metrics_record_moves_total", "counter", no_tags,
              m["record"]["moves"]),
    ]
    repl = m["repl"]
    fixed += [
        entry("mongod_metrics_repl_apply_batches_num_total", "counter",
              no_tags, repl["apply"]["batches"]["num"]),
        entry("mongod_metrics_repl_apply_batches_seconds_total", "counter",
              no_tags, _div1000(repl["apply"]["batches"]["totalMillis"])),
        entry("mongod_metrics_repl_apply_ops_total", "counter", no_tags,
              repl["apply"]["ops"]),
        entry("mongod_metrics_repl_buffer_count", "counter", no_tags,
              repl["buffer"]["count"]),
        entry("mongod_metrics_repl_buffer_max_size_bytes_total", "counter",
              no_tags, repl["buffer"]["maxSizeBytes"]),
        entry("mongod_metrics_repl_buffer_size_bytes", "counter", no_tags,
              repl["buffer"]["sizeBytes"]),
        entry("mongod_metrics_repl_executor_queue", "gauge",
              tags(type="network_in_progress"),
              repl["executor"]["queues"]["networkInProgress"]),
        entry("mongod_metrics_repl_executor_queue", "gauge",
              tags(type="sleepers"), repl["executor"]["queues"]["sleepers"]),
        entry("mongod_metrics_repl_executor_unsignaled_events", "gauge",
              no_tags, repl["executor"]["unsignaledEvents"]),
        entry("mongod_metrics_repl_network_bytes_total", "counter",
              no_tags, repl["network"]["bytes"]),
        entry("mongod_metrics_repl_network_getmores_num_total", "counter",
              no_tags, repl["network"]["getmores"]["num"]),
        entry("mongod_metrics_repl_network_getmores_seconds_total",
              "counter", no_tags,
              _div1000(repl["network"]["getmores"]["totalMillis"])),
        entry("mongod_metrics_repl_network_ops_total", "counter", no_tags,
              repl["network"]["ops"]),
        entry("mongod_metrics_repl_network_readers_created_total",
              "counter", no_tags, repl["network"]["readersCreated"]),
        entry("mongod_metrics_ttl_deleted_documents_total", "counter",
              no_tags, m["ttl"]["deletedDocuments"]),
        entry("mongod_metrics_ttl_passes_total", "counter", no_tags,
              m["ttl"]["passes"]),
        entry("mongod_storage_engine", "gauge",
              F.when(s["storageEngine"]["name"].isNotNull(), F.create_map(
                  F.lit("engine"), s["storageEngine"]["name"]))
               .otherwise(no_tags),
              F.when(s["storageEngine"]["name"].isNotNull(), F.lit(1))),
    ]
    # wiredTiger family (optional section; nulls filter out wholesale)
    for t, fld in (("blocks_read", "blocks read"),
                   ("blocks_read_mapped", "mapped blocks read"),
                   ("blocks_pre_loaded", "blocks pre-loaded"),
                   ("blocks_written", "blocks written")):
        fixed.append(entry("mongod_wiredtiger_blockmanager_blocks_total",
                           "counter", tags(type=t), bm[fld]))
    for t, fld in (("bytes_read", "bytes read"),
                   ("bytes_read_mapped", "mapped bytes read"),
                   ("bytes_written", "bytes written")):
        fixed.append(entry("mongod_wiredtiger_blockmanager_bytes_total",
                           "counter", tags(type=t), bm[fld]))
    for t, fld in (("total", "bytes currently in the cache"),
                   ("dirty", "tracked dirty bytes in the cache"),
                   ("internal_pages",
                    "tracked bytes belonging to internal pages in the cache"),
                   ("leaf_pages",
                    "tracked bytes belonging to leaf pages in the cache")):
        fixed.append(entry("mongod_wiredtiger_cache_bytes", "gauge",
                           tags(type=t), cache[fld]))
    # reference quirk (mod.rs:738-748): *_bytes_total reads page counters
    fixed += [
        entry("mongod_wiredtiger_cache_bytes_total", "counter",
              tags(type="read"), cache["pages read into cache"]),
        entry("mongod_wiredtiger_cache_bytes_total", "counter",
              tags(type="written"), cache["pages written from cache"]),
        entry("mongod_wiredtiger_cache_evicted_total", "counter",
              tags(type="modified"), cache["modified pages evicted"]),
        entry("mongod_wiredtiger_cache_evicted_total", "counter",
              tags(type="unmodified"), cache["unmodified pages evicted"]),
        entry("mongod_wiredtiger_cache_max_bytes", "gauge", no_tags,
              cache["maximum bytes configured"]),
        entry("mongod_wiredtiger_cache_overhead_percent", "gauge", no_tags,
              cache["percentage overhead"]),
        entry("mongod_wiredtiger_cache_pages", "gauge", tags(type="total"),
              cache["pages currently held in the cache"]),
        entry("mongod_wiredtiger_cache_pages", "gauge", tags(type="dirty"),
              cache["tracked dirty pages in the cache"]),
        entry("mongod_wiredtiger_cache_pages_total", "counter",
              tags(type="read"), cache["pages read into cache"]),
        entry("mongod_wiredtiger_cache_pages_total", "counter",
              tags(type="write"), cache["pages written from cache"]),
    ]
    for name, fld in (
            ("mongod_wiredtiger_concurrent_transactions_available_tickets",
             "available"),
            ("mongod_wiredtiger_concurrent_transactions_out_tickets",
             "out"),
            ("mongod_wiredtiger_concurrent_transactions_total_tickets",
             "totalTickets")):
        for mode in ("read", "write"):
            fixed.append(entry(name, "gauge", tags(type=mode),
                               cct[mode][fld]))
    fixed += [
        entry("mongod_wiredtiger_log_bytes_total", "counter",
              tags(type="payload"), log["log bytes of payload data"]),
        entry("mongod_wiredtiger_log_bytes_total", "counter",
              tags(type="written"), log["log bytes written"]),
    ]
    for t, fld in (("write", "log write operations"),
                   ("scan", "log scan operations"),
                   ("scan_double", "log scan records requiring two reads"),
                   ("sync", "log sync operations"),
                   ("sync_dir", "log sync_dir operations"),
                   ("flush", "log flush operations")):
        fixed.append(entry("mongod_wiredtiger_log_operations_total",
                           "counter", tags(type=t), log[fld]))
    fixed += [
        entry("mongod_wiredtiger_log_records_scanned_total", "counter",
              tags(type="compressed"), log["log records compressed"]),
        entry("mongod_wiredtiger_log_records_scanned_total", "counter",
              tags(type="uncompressed"),
              log["log records not compressed"]),
        entry("mongod_wiredtiger_log_records_total", "counter", no_tags,
              log["records processed by log scan"]),
        entry("mongod_wiredtiger_session_open_sessions", "gauge", no_tags,
              wt["session"]["open session count"]),
        entry("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge",
              tags(type="min"),
              _div1000(txn["transaction checkpoint min time (msecs)"])),
        entry("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge",
              tags(type="max"),
              _div1000(txn["transaction checkpoint max time (msecs)"])),
        entry("mongod_wiredtiger_transactions_checkpoint_seconds_total",
              "counter", no_tags,
              _div1000(txn["transaction checkpoint total time (msecs)"])),
        entry("mongod_wiredtiger_transactions_running_checkpoints",
              "gauge", no_tags,
              txn["transaction checkpoint currently running"]),
    ]
    for t, fld in (("begins", "transaction begins"),
                   ("checkpoints", "transaction checkpoints"),
                   ("committed", "transactions committed"),
                   ("rolledback", "transactions rolled back")):
        fixed.append(entry("mongod_wiredtiger_transactions_total",
                           "counter", tags(type=t), txn[fld]))
    fixed += [
        entry("network_bytes_total", "counter", tags(state="bytes_in"),
              s["network"]["bytesIn"]),
        entry("network_bytes_total", "counter", tags(state="bytes_out"),
              s["network"]["bytesOut"]),
        entry("network_metrics_num_requests_total", "counter", no_tags,
              s["network"]["numRequests"]),
    ]

    fixed_arr = F.filter(F.array(*fixed),
                         lambda x: x["value"].isNotNull())

    def map_counters(field: str, name: str) -> Column:
        src = F.coalesce(s[field],
                         F.expr("cast(map() as map<string,bigint>)"))
        return F.transform(
            F.map_entries(src),
            lambda e: entry(name, "counter",
                            F.create_map(F.lit("type"), e["key"]),
                            e["value"]),
        )

    locks = F.flatten(F.transform(
        F.map_entries(F.coalesce(s["locks"], F.expr(
            "cast(map() as map<string, struct<timeAcquiringMicros:"
            " struct<r: bigint, w: bigint>>>)"))),
        lambda e: F.filter(
            F.array(*[
                entry("mongod_locks_time_acquiring_global_seconds_total",
                      "counter",
                      F.create_map(F.lit("type"), e["key"],
                                   F.lit("mode"), F.lit(mode)),
                      e["value"]["timeAcquiringMicros"][short])
                for short, mode in (("r", "read"), ("w", "write"))
            ]),
            lambda x: x["value"].isNotNull(),
        ),
    ))

    lat_schema = ("map<string, struct<latency: bigint, ops: bigint,"
                  " histogram: array<struct<micros: bigint,"
                  " count: bigint>>>>")
    op_lat = F.flatten(F.transform(
        F.map_entries(F.coalesce(s["opLatencies"],
                                 F.expr(f"cast(map() as {lat_schema})"))),
        lambda e: F.concat(
            F.transform(
                F.coalesce(e["value"]["histogram"], F.array()),
                lambda b: entry(
                    "mongod_op_latencies_histogram", "gauge",
                    F.create_map(F.lit("type"), e["key"], F.lit("micros"),
                                 b["micros"].cast("string")),
                    b["count"]),
            ),
            F.filter(
                F.array(
                    entry("mongod_op_latencies_latency", "gauge",
                          F.create_map(F.lit("type"), e["key"]),
                          e["value"]["latency"]),
                    entry("mongod_op_latencies_ops_total", "gauge",
                          F.create_map(F.lit("type"), e["key"]),
                          e["value"]["ops"]),
                ),
                lambda x: x["value"].isNotNull(),
            ),
        ),
    ))

    all_metrics = F.concat(
        fixed_arr, locks, op_lat,
        # reference mod.rs:953-969 — names deliberately swapped there
        map_counters("opcounters", "op_counters_repl_total"),
        map_counters("opcountersRepl", "op_counters_total"),
    )
    out = parsed.select("*", F.explode(all_metrics).alias("_m"))
    return out.select(
        *[c for c in df.columns],
        F.col("_m.name").alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit("absolute").alias("kind"),
        F.col("_m.metric_type").alias("metric_type"),
        F.col("_m.tags").alias("tags"),
        F.col("_m.value").alias("value"),
    )
