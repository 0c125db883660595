"""eventstoredb_metrics parser (sources/eventstoredb.py) vs reference
src/sources/eventstoredb_metrics/types.rs."""

from __future__ import annotations

import json

from vector_spark.sources.eventstoredb import parse_esdb_stats

BODY = json.dumps({
    "proc": {
        "id": 4200,
        "mem": 123456789.0,
        "cpu": 1.5,
        "diskIo": {"readBytes": 11.0, "writtenBytes": 22.0,
                   "readOps": 3.0, "writeOps": 4.0},
    },
    "sys": {
        "freeMem": 555.0,
        "loadavg": {"1m": 0.1, "5m": 0.2, "15m": 0.3},
        "drive": {"/var/lib/esdb": {"availableBytes": 100.0,
                                    "totalBytes": 300.0,
                                    "usedBytes": 200.0}},
    },
})


def test_esdb_stats_field_map(spark):
    df = spark.createDataFrame([(1, BODY)], "rid int, body string")
    rows = parse_esdb_stats(df).collect()
    m = {(r.name, r.tags.get("path")): (r.metric_type, r.value, r.tags)
         for r in rows}
    assert m[("process_memory_used_bytes", None)][:2] == ("gauge", 123456789.0)
    assert m[("disk_read_bytes_total", None)][:2] == ("counter", 11.0)
    assert m[("disk_write_ops_total", None)][:2] == ("counter", 4.0)
    assert m[("memory_free_bytes", None)][:2] == ("gauge", 555.0)
    assert m[("disk_total_bytes", "/var/lib/esdb")][:2] == ("gauge", 300.0)
    assert m[("disk_free_bytes", "/var/lib/esdb")][:2] == ("gauge", 100.0)
    assert m[("disk_used_bytes", "/var/lib/esdb")][:2] == ("gauge", 200.0)
    assert all(r.tags["id"] == "4200" for r in rows)
    assert all(r.namespace == "eventstoredb" and r.kind == "absolute"
               for r in rows)
    assert len(rows) == 9


def test_esdb_no_drive(spark):
    body = json.dumps({"proc": {"id": 1, "mem": 5.0,
                                "diskIo": {"readBytes": 1.0}},
                       "sys": {"freeMem": 2.0}})
    df = spark.createDataFrame([(1, body)], "rid int, body string")
    rows = parse_esdb_stats(df).collect()
    names = {r.name for r in rows}
    assert "disk_total_bytes" not in names
    assert {"process_memory_used_bytes", "disk_read_bytes_total",
            "memory_free_bytes"} <= names
    assert len(rows) == 3  # absent diskIo fields skipped
