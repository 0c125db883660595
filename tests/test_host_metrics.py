"""host_metrics /proc parsers (sources/host_metrics.py) vs reference
src/sources/host_metrics metric naming."""

from __future__ import annotations

from vector_spark.sources import host_metrics as HM

PROC_STAT = """cpu  1000 20 300 40000 500 0 60 0 0 0
cpu0 600 12 180 20000 300 0 30 0 0 0
cpu1 400 8 120 20000 200 0 30 0 0 0
intr 123456 0 9
ctxt 987654
btime 1700000000
"""

MEMINFO = """MemTotal:       16384000 kB
MemFree:         2048000 kB
MemAvailable:    8192000 kB
Buffers:          512000 kB
Cached:          4096000 kB
SwapCached:            0 kB
Active:          6144000 kB
Active(anon):    3072000 kB
Shmem:            256000 kB
SwapTotal:       8388608 kB
SwapFree:        8388000 kB
"""

LOADAVG = "0.52 0.58 1.59 2/1234 56789\n"

NET_DEV = """Inter-|   Receive                                                |  Transmit
 face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed
    lo: 1111111    9999    1    0    0     0          0         0  1111111    9999    2    0    0     0       0          0
  eth0: 22222222   88888    3    4    0     0          0         0  33333333   77777    5    6    0     0       0          0
"""

DISKSTATS = """   8       0 sda 100 5 2048 300 200 10 4096 500 0 400 800 0 0 0 0
   8       1 sda1 50 2 1024 150 100 5 2048 250 0 200 400 0 0 0 0
"""


def _rows(spark, parser, body):
    df = spark.createDataFrame([(1, body)], "rid int, body string")
    return parser(df).collect()


def test_proc_stat_per_cpu_modes(spark):
    rows = _rows(spark, HM.parse_proc_stat, PROC_STAT)
    m = {(r.tags["cpu"], r.tags["mode"]): r.value for r in rows}
    # aggregate "cpu " line is skipped; two per-cpu lines × 5 modes
    assert len(rows) == 10
    assert all(r.name == "cpu_seconds_total" for r in rows)
    assert all(r.metric_type == "counter" and r.kind == "absolute"
               for r in rows)
    assert m[("0", "user")] == 6.0       # 600 jiffies / USER_HZ 100
    assert m[("0", "io_wait")] == 3.0
    assert m[("1", "idle")] == 200.0
    assert m[("1", "nice")] == 0.08


def test_meminfo_gauges_and_derived(spark):
    rows = _rows(spark, HM.parse_meminfo, MEMINFO)
    m = {r.name: r.value for r in rows}
    assert m["memory_total_bytes"] == 16384000 * 1024
    assert m["memory_available_bytes"] == 8192000 * 1024
    assert m["memory_active_bytes"] == 6144000 * 1024  # not Active(anon)
    assert m["memory_shared_bytes"] == 256000 * 1024
    assert m["memory_used_bytes"] == (16384000 - 2048000) * 1024
    assert m["memory_swap_used_bytes"] == (8388608 - 8388000) * 1024
    assert all(r.metric_type == "gauge" for r in rows)
    assert len(rows) == 11


def test_loadavg(spark):
    m = {r.name: r.value for r in _rows(spark, HM.parse_loadavg, LOADAVG)}
    assert m == {"load1": 0.52, "load5": 0.58, "load15": 1.59}


def test_net_dev_per_device(spark):
    rows = _rows(spark, HM.parse_net_dev, NET_DEV)
    m = {(r.tags["device"], r.name): r.value for r in rows}
    assert m[("eth0", "network_receive_bytes_total")] == 22222222.0
    assert m[("eth0", "network_transmit_bytes_total")] == 33333333.0
    assert m[("eth0", "network_transmit_packets_drop_total")] == 6.0
    assert m[("lo", "network_receive_errs_total")] == 1.0
    assert len(rows) == 14  # 2 devices × 7 metrics; header lines skipped


def test_diskstats_per_device(spark):
    rows = _rows(spark, HM.parse_diskstats, DISKSTATS)
    m = {(r.tags["device"], r.name): r.value for r in rows}
    assert m[("sda", "disk_reads_completed_total")] == 100.0
    assert m[("sda", "disk_read_bytes_total")] == 2048 * 512.0
    assert m[("sda", "disk_writes_completed_total")] == 200.0
    assert m[("sda1", "disk_written_bytes_total")] == 2048 * 512.0
    assert len(rows) == 8
