"""mongodb_metrics parser (sources/mongodb_metrics.py) vs reference
src/sources/mongodb_metrics/{mod,types}.rs."""

from __future__ import annotations

import json

from vector_spark.sources.mongodb_metrics import parse_server_status

BODY = json.dumps({
    "uptime": 3600.5,
    "uptimeEstimate": 3600,
    "localTime": 1700000001999,  # ms; /1000 truncates -> 1700000001
    "asserts": {"regular": 1, "warning": 2, "msg": 3, "user": 4,
                "rollovers": 5},
    "connections": {"active": 7, "available": 100, "current": 12},
    "extra_info": {"heap_usage_bytes": 4096, "page_faults": 9},
    "mem": {"resident": 256, "virtual": 1024},  # mapped absent
    "globalLock": {
        "totalTime": 987654,
        "activeClients": {"total": 10, "readers": 4, "writers": 6},
        "currentQueue": {"total": 3, "readers": 1, "writers": 2},
    },
    "locks": {"Global": {"timeAcquiringMicros": {"r": 1500, "w": 2500}},
              "Database": {"timeAcquiringMicros": {"r": 10}}},
    "metrics": {
        "cursor": {"timedOut": 2,
                   "open": {"noTimeout": 0, "pinned": 1, "total": 5}},
        "document": {"deleted": 11, "inserted": 22, "returned": 33,
                     "updated": 44},
        "getLastError": {"wtime": {"num": 6, "totalMillis": 2999},
                         "wtimeouts": 1},
        "operation": {"scanAndOrder": 8, "writeConflicts": 9},
        "queryExecutor": {"scanned": 100, "scannedObjects": 200,
                          "collectionScans": {"total": 7}},
        "record": {"moves": 3},
        "repl": {
            "apply": {"batches": {"num": 5, "totalMillis": 1999},
                      "ops": 50},
            "buffer": {"count": 1, "maxSizeBytes": 268435456,
                       "sizeBytes": 1024},
            "executor": {"queues": {"networkInProgress": 0, "sleepers": 2},
                         "unsignaledEvents": 1},
            "network": {"bytes": 4096,
                        "getmores": {"num": 10, "totalMillis": 5500},
                        "ops": 20, "readersCreated": 2},
        },
        "ttl": {"deletedDocuments": 40, "passes": 4},
    },
    "opLatencies": {
        "reads": {"latency": 1000, "ops": 10,
                  "histogram": [{"micros": 1, "count": 3},
                                {"micros": 2, "count": 7}]},
        "writes": {"latency": 2000, "ops": 20, "histogram": []},
    },
    "storageEngine": {"name": "wiredTiger"},
    "wiredTiger": {
        "block-manager": {
            "blocks pre-loaded": 1, "blocks read": 2, "blocks written": 3,
            "bytes read": 4, "bytes written": 5, "mapped blocks read": 6,
            "mapped bytes read": 7,
        },
        "cache": {
            "bytes currently in the cache": 1000,
            "maximum bytes configured": 2000.5,
            "modified pages evicted": 10,
            "pages currently held in the cache": 50,
            "pages read into cache": 60, "pages written from cache": 70,
            "percentage overhead": 8,
            "tracked bytes belonging to internal pages in the cache": 111,
            "tracked bytes belonging to leaf pages in the cache": 222,
            "tracked dirty bytes in the cache": 333,
            "tracked dirty pages in the cache": 9,
            "unmodified pages evicted": 20,
        },
        "concurrentTransactions": {
            "write": {"out": 1, "available": 127, "totalTickets": 128},
            "read": {"out": 2, "available": 126, "totalTickets": 128},
        },
        "log": {
            "log bytes of payload data": 10, "log bytes written": 20,
            "log flush operations": 30, "log records compressed": 40,
            "log records not compressed": 50, "log scan operations": 60,
            "log scan records requiring two reads": 70,
            "log sync operations": 80, "log sync_dir operations": 90,
            "log write operations": 100,
            "records processed by log scan": 110,
        },
        "session": {"open session count": 15},
        "transaction": {
            "transaction begins": 1, "transaction checkpoints": 2,
            "transaction checkpoint currently running": 0,
            "transaction checkpoint max time (msecs)": 5999,
            "transaction checkpoint min time (msecs)": 1001,
            "transaction checkpoint total time (msecs)": 30500,
            "transactions committed": 3, "transactions rolled back": 4,
        },
    },
    "network": {"bytesIn": 111, "bytesOut": 222, "numRequests": 333},
    "opcounters": {"insert": 5, "query": 6},
    "opcountersRepl": {"insert": 7, "delete": 8},
})


def _index(rows):
    return {(r.name, tuple(sorted(r.tags.items()))): (r.metric_type,
                                                      r.value)
            for r in rows}


def test_server_status_field_map(spark):
    df = spark.createDataFrame([(1, BODY)], "rid int, body string")
    rows = parse_server_status(df).collect()
    m = _index(rows)
    assert m[("up", ())] == ("gauge", 1.0)
    assert m[("asserts_total", (("type", "rollovers"),))] == ("counter",
                                                              5.0)
    assert m[("connections", (("state", "available"),))] == ("counter",
                                                             100.0)
    assert m[("extra_info_heap_usage_bytes", ())] == ("gauge", 4096.0)
    # truncating i64 /1000 on the epoch-ms local time
    assert m[("instance_local_time", ())] == ("gauge", 1700000001.0)
    assert m[("instance_uptime_seconds_total", ())] == ("gauge", 3600.5)
    assert m[("memory", (("type", "resident"),))] == ("gauge", 256.0)
    assert ("memory", (("type", "mapped"),)) not in m  # absent optional
    assert m[("mongod_global_lock_current_queue",
              (("type", "writers"),))] == ("gauge", 2.0)
    # locks map: tag type = lock name, mode read/write; raw micros
    assert m[("mongod_locks_time_acquiring_global_seconds_total",
              (("mode", "write"), ("type", "Global")))] == ("counter",
                                                            2500.0)
    assert m[("mongod_locks_time_acquiring_global_seconds_total",
              (("mode", "read"), ("type", "Database")))] == ("counter",
                                                             10.0)
    assert ("mongod_locks_time_acquiring_global_seconds_total",
            (("mode", "write"), ("type", "Database"))) not in m
    assert m[("mongod_metrics_document_total",
              (("state", "inserted"),))] == ("counter", 22.0)
    # totalMillis /1000 truncates (2999 -> 2)
    assert m[("mongod_metrics_get_last_error_wtime_seconds_total",
              ())] == ("counter", 2.0)
    assert m[("mongod_metrics_query_executor_total",
              (("state", "collection_scans"),))] == ("counter", 7.0)
    assert m[("mongod_metrics_repl_network_getmores_seconds_total",
              ())] == ("counter", 5.0)
    # opLatencies histograms: micros tag is the stringified bound
    assert m[("mongod_op_latencies_histogram",
              (("micros", "2"), ("type", "reads")))] == ("gauge", 7.0)
    assert m[("mongod_op_latencies_ops_total",
              (("type", "writes"),))] == ("gauge", 20.0)
    assert m[("mongod_storage_engine",
              (("engine", "wiredTiger"),))] == ("gauge", 1.0)
    # wiredTiger families (space/paren field names)
    assert m[("mongod_wiredtiger_blockmanager_blocks_total",
              (("type", "blocks_read_mapped"),))] == ("counter", 6.0)
    assert m[("mongod_wiredtiger_cache_bytes",
              (("type", "leaf_pages"),))] == ("gauge", 222.0)
    # reference quirk: cache_bytes_total reads the page counters
    assert m[("mongod_wiredtiger_cache_bytes_total",
              (("type", "read"),))] == ("counter", 60.0)
    assert m[("mongod_wiredtiger_cache_pages_total",
              (("type", "write"),))] == ("counter", 70.0)
    assert m[("mongod_wiredtiger_cache_max_bytes", ())] == ("gauge",
                                                            2000.5)
    assert m[("mongod_wiredtiger_concurrent_transactions_out_tickets",
              (("type", "read"),))] == ("gauge", 2.0)
    assert m[("mongod_wiredtiger_log_operations_total",
              (("type", "sync_dir"),))] == ("counter", 90.0)
    # checkpoint msec fields /1000 truncate: 5999->5, 1001->1, 30500->30
    assert m[("mongod_wiredtiger_transactions_checkpoint_seconds",
              (("type", "max"),))] == ("gauge", 5.0)
    assert m[("mongod_wiredtiger_transactions_checkpoint_seconds",
              (("type", "min"),))] == ("gauge", 1.0)
    assert m[("mongod_wiredtiger_transactions_checkpoint_seconds_total",
              ())] == ("counter", 30.0)
    assert m[("mongod_wiredtiger_transactions_total",
              (("type", "rolledback"),))] == ("counter", 4.0)
    assert m[("network_bytes_total",
              (("state", "bytes_out"),))] == ("counter", 222.0)
    # reference swaps the opcounters names (mod.rs:953-969)
    assert m[("op_counters_repl_total",
              (("type", "query"),))] == ("counter", 6.0)
    assert m[("op_counters_total",
              (("type", "delete"),))] == ("counter", 8.0)
    assert all(r.namespace == "mongodb" and r.kind == "absolute"
               for r in rows)


def test_server_status_minimal_and_malformed(spark):
    minimal = json.dumps({"asserts": {"regular": 1},
                          "network": {"bytesIn": 5}})
    df = spark.createDataFrame(
        [(1, minimal), (2, "{not json")], "rid int, body string")
    rows = parse_server_status(df).collect()
    by_rid = {}
    for r in rows:
        by_rid.setdefault(r.rid, []).append(r)
    names1 = {r.name for r in by_rid[1]}
    # absent sections (wiredTiger, metrics, ...) are skipped wholesale
    assert "mongod_wiredtiger_session_open_sessions" not in names1
    assert "mongod_metrics_ttl_passes_total" not in names1
    assert {"up", "asserts_total", "network_bytes_total"} <= names1
    # malformed document -> up=0 and nothing else
    assert [(r.name, r.value) for r in by_rid[2]] == [("up", 0.0)]
