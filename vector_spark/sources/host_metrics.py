"""host_metrics source — /proc text parsers with the reference's metric
names.

Parity: reference ``src/sources/host_metrics/{cpu,memory,disk,network,
mod}.rs``. The reference reads the OS through the heim crate; the
portable, auditable analog of each collector is the /proc text file it
ultimately reflects, so this module parses those formats (one input row
per scraped file body, e.g. shipped by the exec source or a node agent)
into the normalized metric frame. Every metric is MetricKind::Absolute
(mod.rs:493-508), default namespace ``host`` (mod.rs default_namespace).

Collector map:

* cpu.rs → :func:`parse_proc_stat`: per-``cpuN`` line, counter
  ``cpu_seconds_total`` tagged ``mode ∈ {user,nice,system,idle,io_wait}``
  + ``cpu=N`` (jiffies / USER_HZ seconds).
* memory.rs → :func:`parse_meminfo`: gauges ``memory_{total,free,
  available,active,buffers,cached,shared,used}_bytes`` and
  ``memory_swap_{total,free,used}_bytes`` (kB × 1024; ``used`` derived
  total−free, swap used total−free — heim's linux definitions).
* mod.rs loadavg → :func:`parse_loadavg`: gauges ``load1/load5/load15``.
* network.rs → :func:`parse_net_dev`: per-device counters
  ``network_receive_{bytes,packets,errs}_total``,
  ``network_transmit_{bytes,packets,errs}_total``,
  ``network_transmit_packets_drop_total``, tagged ``device``.
* disk.rs → :func:`parse_diskstats`: per-device counters
  ``disk_{reads,writes}_completed_total`` and
  ``disk_{read,written}_bytes_total`` (sectors × 512), tagged ``device``.

Output columns appended: ``name, namespace, kind, metric_type, tags
(map<string,string>), value``. Pure JVM column math; the explodes fan out
over the fixed metric list / bounded device-line count per body.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CPU_MODES = [  # field position in the cpuN line (1-based after the label)
    ("user", 1), ("nice", 2), ("system", 3), ("idle", 4), ("io_wait", 5),
]

_MEMINFO = [  # (/proc/meminfo key, metric name)
    ("MemTotal", "memory_total_bytes"),
    ("MemFree", "memory_free_bytes"),
    ("MemAvailable", "memory_available_bytes"),
    ("Active", "memory_active_bytes"),
    ("Buffers", "memory_buffers_bytes"),
    ("Cached", "memory_cached_bytes"),
    ("Shmem", "memory_shared_bytes"),
    ("SwapTotal", "memory_swap_total_bytes"),
    ("SwapFree", "memory_swap_free_bytes"),
]

_NET_FIELDS = [  # (field index in the /proc/net/dev row, metric name)
    (1, "network_receive_bytes_total"),
    (2, "network_receive_packets_total"),
    (3, "network_receive_errs_total"),
    (9, "network_transmit_bytes_total"),
    (10, "network_transmit_packets_total"),
    (11, "network_transmit_errs_total"),
    (12, "network_transmit_packets_drop_total"),
]

_DISK_FIELDS = [  # (field index in the /proc/diskstats row, name, scale)
    (4, "disk_reads_completed_total", 1),
    (6, "disk_read_bytes_total", 512),
    (8, "disk_writes_completed_total", 1),
    (10, "disk_written_bytes_total", 512),
]

def _no_tags() -> Column:
    # Columns cannot be built at import time (needs an active session).
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )


def _emit(df: DataFrame, entries: list[Column], namespace: str,
          metric_type_default: str | None = None) -> DataFrame:
    arr = F.filter(F.array(*entries), lambda x: x["value"].isNotNull())
    out = df.select("*", F.explode(arr).alias("_m"))
    return out.select(
        *[c for c in df.columns],
        F.col("_m.name").alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit("absolute").alias("kind"),
        F.col("_m.metric_type").alias("metric_type"),
        F.col("_m.tags").alias("tags"),
        F.col("_m.value").alias("value"),
    )


def _m(name, metric_type: str, tags: Column, value: Column) -> Column:
    name_col = F.lit(name) if isinstance(name, str) else name
    return F.struct(
        name_col.alias("name"),
        F.lit(metric_type).alias("metric_type"),
        tags.alias("tags"),
        value.cast("double").alias("value"),
    )


def parse_proc_stat(df: DataFrame, col: str = "body",
                    user_hz: int = 100,
                    namespace: str = "host") -> DataFrame:
    """/proc/stat body → cpu_seconds_total counters (see module doc)."""
    lines = F.filter(
        F.split(F.col(col), "\n"), lambda ln: ln.rlike(r"^cpu[0-9]+ ")
    )
    rows = df.select("*", F.explode(lines).alias("_line"))
    fields = F.split(F.col("_line"), r"\s+")
    cpu = F.substring(fields[0], 4, 8)
    entries = [
        _m(
            "cpu_seconds_total", "counter",
            F.create_map(F.lit("mode"), F.lit(mode), F.lit("cpu"), cpu),
            fields[idx].cast("double") / user_hz,
        )
        for mode, idx in _CPU_MODES
    ]
    return _emit(rows, entries, namespace).drop("_line")


def parse_meminfo(df: DataFrame, col: str = "body",
                  namespace: str = "host") -> DataFrame:
    """/proc/meminfo body → memory gauges (kB × 1024)."""
    c = F.col(col)

    def kb(key: str) -> Column:
        raw = F.regexp_extract(c, rf"(?m)^{key}: +(\d+) kB$", 1)
        return F.nullif(raw, F.lit("")).cast("double") * 1024

    entries = [
        _m(name, "gauge", _no_tags(), kb(key)) for key, name in _MEMINFO
    ]
    entries.append(
        _m("memory_used_bytes", "gauge", _no_tags(),
           kb("MemTotal") - kb("MemFree"))
    )
    entries.append(
        _m("memory_swap_used_bytes", "gauge", _no_tags(),
           kb("SwapTotal") - kb("SwapFree"))
    )
    return _emit(df, entries, namespace)


def parse_loadavg(df: DataFrame, col: str = "body",
                  namespace: str = "host") -> DataFrame:
    """/proc/loadavg body → load1/load5/load15 gauges."""
    c = F.col(col)
    entries = []
    for i, name in ((1, "load1"), (2, "load5"), (3, "load15")):
        raw = F.regexp_extract(
            c, r"^([0-9.]+) ([0-9.]+) ([0-9.]+) ", i
        )
        entries.append(
            _m(name, "gauge", _no_tags(),
               F.nullif(raw, F.lit("")).cast("double"))
        )
    return _emit(df, entries, namespace)


def parse_net_dev(df: DataFrame, col: str = "body",
                  namespace: str = "host") -> DataFrame:
    """/proc/net/dev body → per-device network counters."""
    lines = F.filter(
        F.split(F.col(col), "\n"),
        lambda ln: ln.rlike(r"^\s*[A-Za-z0-9@._-]+:\s*[0-9]"),
    )
    rows = df.select("*", F.explode(lines).alias("_line"))
    device = F.regexp_extract(F.col("_line"), r"^\s*([^:]+):", 1)
    fields = F.split(
        F.regexp_replace(F.trim(F.col("_line")), r"^[^:]+:\s*", ""), r"\s+"
    )
    tags = F.create_map(F.lit("device"), device)
    entries = [
        _m(name, "counter", tags, fields[idx - 1].cast("double"))
        for idx, name in _NET_FIELDS
    ]
    return _emit(rows, entries, namespace).drop("_line")


def parse_diskstats(df: DataFrame, col: str = "body",
                    namespace: str = "host") -> DataFrame:
    """/proc/diskstats body → per-device disk counters."""
    lines = F.filter(
        F.split(F.col(col), "\n"),
        lambda ln: ln.rlike(r"^\s*\d+\s+\d+\s+\S+\s+\d"),
    )
    rows = df.select("*", F.explode(lines).alias("_line"))
    fields = F.split(F.trim(F.col("_line")), r"\s+")
    device = fields[2]
    tags = F.create_map(F.lit("device"), device)
    entries = [
        _m(name, "counter", tags,
           fields[idx - 1].cast("double") * scale)
        for idx, name, scale in _DISK_FIELDS
    ]
    return _emit(rows, entries, namespace).drop("_line")
