"""aws_ecs_metrics parser (sources/ecs_metrics.py) vs reference
src/sources/aws_ecs_metrics/parser.rs field map."""

from __future__ import annotations

import json

from vector_spark.sources import ecs_metrics as EM

BODY = json.dumps({
    "c1": {
        "read": "2026-01-02T03:04:05.123456789Z",
        "name": "web-1",
        "blkio_stats": {
            "io_service_bytes_recursive": [
                {"major": 8, "minor": 0, "op": "Read", "value": 4096.0},
                {"major": 8, "minor": 0, "op": "Write", "value": 8192.0},
            ],
            "io_service_time_recursive": [
                {"major": 8, "minor": 0, "op": "Total",
                 "value": 2_000_000_000.0},
            ],
            "io_time_recursive": [
                {"major": 8, "minor": 0, "op": "", "value": 1500.0},
            ],
        },
        "cpu_stats": {
            "cpu_usage": {
                "total_usage": 100.0, "percpu_usage": [60.0, 40.0, 5.0],
                "usage_in_usermode": 70.0, "usage_in_kernelmode": 30.0,
            },
            "system_cpu_usage": 1000.0, "online_cpus": 2,
            "throttling_data": {
                "periods": 10.0, "throttled_periods": 2.0,
                "throttled_time": 3_000_000_000.0,
            },
        },
        "memory_stats": {
            "usage": 1024.0, "max_usage": 2048.0, "limit": 4096.0,
            "stats": {"rss": 512.0, "cache": 256.0, "pgfault": 99.0,
                      "total_pgpgin": 7.0},
        },
        "networks": {
            "eth0": {"rx_bytes": 111.0, "tx_bytes": 222.0,
                     "rx_dropped": 1.0},
        },
    },
    "c2": {
        "read": "2026-01-02T03:04:05Z",
        "memory_stats": {"usage": 10.0},
    },
})


def test_full_field_map(spark):
    df = spark.createDataFrame([(1, BODY)], "rid int, body string")
    rows = EM.parse_ecs_stats(df).collect()
    m = {}
    for r in rows:
        key = (r.container_id, r.name,
               r.tags.get("device"), r.tags.get("op"), r.tags.get("cpu"))
        m[key] = (r.metric_type, r.value, r.tags, r.event_ts)

    # blkio: device major:minor, lowercased op, ns→s and ms→s divisions
    t, v, tags, ts = m[("c1", "blkio_recursive_io_service_bytes_total",
                        "8:0", "read", None)]
    assert (t, v) == ("counter", 4096.0)
    assert tags["container_name"] == "web-1"
    assert str(ts) == "2026-01-02 03:04:05.123456"  # ns truncated to µs
    assert m[("c1", "blkio_recursive_io_service_time_seconds_total",
              "8:0", "total", None)][1] == 2.0
    assert m[("c1", "blkio_recursive_io_time_seconds_total",
              "8:0", "", None)][1] == 1.5

    # cpu: jiffies counters, online gauge, throttled ns→s
    assert m[("c1", "cpu_online_cpus", None, None, None)] [:2] == ("gauge", 2.0)
    assert m[("c1", "cpu_usage_total_jiffies_total", None, None, None)][1] == 100.0
    assert m[("c1", "cpu_throttled_time_seconds_total", None, None, None)][1] == 3.0
    # percpu bounded by online_cpus: indices 0,1 only
    assert m[("c1", "cpu_usage_percpu_jiffies_total", None, None, "0")][1] == 60.0
    assert m[("c1", "cpu_usage_percpu_jiffies_total", None, None, "1")][1] == 40.0
    assert ("c1", "cpu_usage_percpu_jiffies_total", None, None, "2") not in m

    # memory gauges + counters
    assert m[("c1", "memory_used_bytes", None, None, None)][:2] == ("gauge", 1024.0)
    assert m[("c1", "memory_rss_bytes", None, None, None)][1] == 512.0
    assert m[("c1", "memory_page_faults_total", None, None, None)][:2] == (
        "counter", 99.0)
    assert m[("c1", "memory_total_page_charged_total", None, None, None)][1] == 7.0

    # network per-interface; absent fields skipped
    assert m[("c1", "network_receive_bytes_total", "eth0", None, None)][1] == 111.0
    assert m[("c1", "network_receive_packets_drop_total", "eth0", None, None)][1] == 1.0
    assert ("c1", "network_transmit_errs_total", "eth0", None, None) not in m

    # minimal container: only its one gauge; no container_name tag
    c2 = [r for r in rows if r.container_id == "c2"]
    assert [(r.name, r.value) for r in c2] == [("memory_used_bytes", 10.0)]
    assert "container_name" not in c2[0].tags
    assert str(c2[0].event_ts) == "2026-01-02 03:04:05"
    assert all(r.kind == "absolute" and r.namespace == "awsecs" for r in rows)
