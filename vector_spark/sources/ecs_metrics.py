"""aws_ecs_metrics source — ECS task-metadata stats JSON → metric frame.

Parity: reference ``src/sources/aws_ecs_metrics/parser.rs`` — the ECS
task metadata endpoint's ``/task/stats`` response is a JSON object of
``container_id → docker ContainerStats``; every emitted metric is
MetricKind::Absolute with tags ``container_id`` (+ ``container_name``
when present). Full field map:

* blkio lists → per-entry counters ``blkio_recursive_*_total`` tagged
  ``device="major:minor"`` + lowercased ``op`` (:156-253); the two time
  lists divide ns→s (service_time, wait_time) and ms→s (io_time);
* cpu/precpu → prefix ``cpu``/``precpu``: ``online_cpus`` gauge, jiffies
  counters (system/usermode/kernelmode/total), throttling counters
  (throttled_time ns→s), and per-cpu counters ``usage_percpu_jiffies_
  total`` tagged ``cpu=<index>`` emitted only up to ``online_cpus``;
* memory → usage/max/limit gauges, the 24 cgroup stat byte gauges, and 8
  page-fault/charge counters (pgpgin → page_charged_total etc.);
* networks map → per-interface counters tagged ``device`` (rx_dropped →
  ``network_receive_packets_drop_total`` etc.).

Spark-first: the whole decode is ``from_json`` with a typed schema +
explode over a built entries array — zero Python in the plan. One input
row = one stats response body (fan-out bounded by containers × fixed
metric list)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLKIO_LIST = ("array<struct<major: bigint, minor: bigint, op: string,"
               " value: double>>")
_CPU_STRUCT = """struct<
  cpu_usage: struct<total_usage: double, percpu_usage: array<double>,
                    usage_in_usermode: double, usage_in_kernelmode: double>,
  system_cpu_usage: double, online_cpus: int,
  throttling_data: struct<periods: double, throttled_periods: double,
                          throttled_time: double>>"""

STATS_SCHEMA = f"""map<string, struct<
  read: string, name: string,
  blkio_stats: struct<
    io_merged_recursive: {_BLKIO_LIST},
    io_queue_recursive: {_BLKIO_LIST},
    io_service_bytes_recursive: {_BLKIO_LIST},
    io_service_time_recursive: {_BLKIO_LIST},
    io_serviced_recursive: {_BLKIO_LIST},
    io_time_recursive: {_BLKIO_LIST},
    io_wait_time_recursive: {_BLKIO_LIST},
    sectors_recursive: {_BLKIO_LIST}>,
  cpu_stats: {_CPU_STRUCT}, precpu_stats: {_CPU_STRUCT},
  memory_stats: struct<usage: double, max_usage: double, limit: double,
    stats: struct<
      active_anon: double, active_file: double, cache: double,
      dirty: double, inactive_anon: double, inactive_file: double,
      mapped_file: double, pgfault: double, pgmajfault: double,
      pgpgin: double, pgpgout: double, rss: double, rss_huge: double,
      unevictable: double, writeback: double,
      total_active_anon: double, total_active_file: double,
      total_cache: double, total_dirty: double,
      total_inactive_anon: double, total_inactive_file: double,
      total_mapped_file: double, total_pgfault: double,
      total_pgmajfault: double, total_pgpgin: double,
      total_pgpgout: double, total_rss: double, total_rss_huge: double,
      total_unevictable: double, total_writeback: double,
      hierarchical_memory_limit: double,
      hierarchical_memsw_limit: double>>,
  networks: map<string, struct<
    rx_bytes: double, rx_packets: double, rx_errors: double,
    rx_dropped: double, tx_bytes: double, tx_packets: double,
    tx_errors: double, tx_dropped: double>>>>"""

_BLKIO = [  # (json list field, metric suffix, divisor)
    ("io_merged_recursive", "recursive_io_merged_total", 1),
    ("io_queue_recursive", "recursive_io_queued_total", 1),
    ("io_service_bytes_recursive", "recursive_io_service_bytes_total", 1),
    ("io_service_time_recursive",
     "recursive_io_service_time_seconds_total", 1_000_000_000),
    ("io_serviced_recursive", "recursive_io_serviced_total", 1),
    ("io_time_recursive", "recursive_io_time_seconds_total", 1_000),
    ("io_wait_time_recursive",
     "recursive_io_wait_time_seconds_total", 1_000_000_000),
    ("sectors_recursive", "recursive_sectors_total", 1),
]

_MEM_GAUGES_TOP = [("usage", "used_bytes"), ("max_usage", "max_used_bytes"),
                   ("limit", "limit_bytes")]

_MEM_GAUGES = [
    ("active_anon", "active_anonymous_bytes"),
    ("active_file", "active_file_bytes"),
    ("cache", "cache_bytes"), ("dirty", "dirty_bytes"),
    ("inactive_anon", "inactive_anonymous_bytes"),
    ("inactive_file", "inactive_file_bytes"),
    ("mapped_file", "mapped_file_bytes"), ("rss", "rss_bytes"),
    ("rss_huge", "rss_hugepages_bytes"),
    ("unevictable", "unevictable_bytes"), ("writeback", "writeback_bytes"),
    ("total_active_anon", "total_active_anonymous_bytes"),
    ("total_active_file", "total_active_file_bytes"),
    ("total_cache", "total_cache_bytes"),
    ("total_dirty", "total_dirty_bytes"),
    ("total_inactive_anon", "total_inactive_anonymous_bytes"),
    ("total_inactive_file", "total_inactive_file_bytes"),
    ("total_mapped_file", "total_mapped_file_bytes"),
    ("total_rss", "total_rss_bytes"),
    ("total_rss_huge", "total_rss_hugepages_bytes"),
    ("total_unevictable", "total_unevictable_bytes"),
    ("total_writeback", "total_writeback_bytes"),
    ("hierarchical_memory_limit", "hierarchical_memory_limit_bytes"),
    ("hierarchical_memsw_limit", "hierarchical_memsw_limit_bytes"),
]

_MEM_COUNTERS = [
    ("pgfault", "page_faults_total"), ("pgmajfault", "major_faults_total"),
    ("pgpgin", "page_charged_total"), ("pgpgout", "page_uncharged_total"),
    ("total_pgfault", "total_page_faults_total"),
    ("total_pgmajfault", "total_major_faults_total"),
    ("total_pgpgin", "total_page_charged_total"),
    ("total_pgpgout", "total_page_uncharged_total"),
]

_NET = [
    ("rx_bytes", "receive_bytes_total"),
    ("rx_packets", "receive_packets_total"),
    ("rx_dropped", "receive_packets_drop_total"),
    ("rx_errors", "receive_errs_total"),
    ("tx_bytes", "transmit_bytes_total"),
    ("tx_packets", "transmit_packets_total"),
    ("tx_dropped", "transmit_packets_drop_total"),
    ("tx_errors", "transmit_errs_total"),
]


def _entry(name: Column | str, metric_type: str, tags: Column,
           value: Column) -> Column:
    name_col = F.lit(name) if isinstance(name, str) else name
    return F.struct(
        name_col.alias("name"),
        F.lit(metric_type).alias("metric_type"),
        tags.alias("tags"),
        value.cast("double").alias("value"),
    )


def _cpu_entries(cs: Column, prefix: str, base: Column) -> list[Column]:
    out = [
        _entry(f"{prefix}_online_cpus", "gauge", base,
               cs["online_cpus"]),
        _entry(f"{prefix}_usage_system_jiffies_total", "counter", base,
               cs["system_cpu_usage"]),
        _entry(f"{prefix}_usage_usermode_jiffies_total", "counter", base,
               cs["cpu_usage"]["usage_in_usermode"]),
        _entry(f"{prefix}_usage_kernelmode_jiffies_total", "counter", base,
               cs["cpu_usage"]["usage_in_kernelmode"]),
        _entry(f"{prefix}_usage_total_jiffies_total", "counter", base,
               cs["cpu_usage"]["total_usage"]),
        _entry(f"{prefix}_throttling_periods_total", "counter", base,
               cs["throttling_data"]["periods"]),
        _entry(f"{prefix}_throttled_periods_total", "counter", base,
               cs["throttling_data"]["throttled_periods"]),
        _entry(f"{prefix}_throttled_time_seconds_total", "counter", base,
               cs["throttling_data"]["throttled_time"] / 1_000_000_000),
    ]
    return out


def _percpu_entries(cs: Column, prefix: str, base: Column) -> Column:
    """array of per-cpu counter entries, bounded by online_cpus."""
    sliced = F.when(
        cs["online_cpus"].isNotNull()
        & cs["cpu_usage"]["percpu_usage"].isNotNull(),
        F.slice(cs["cpu_usage"]["percpu_usage"], 1, cs["online_cpus"]),
    ).otherwise(F.array().cast("array<double>"))
    return F.transform(
        sliced,
        lambda v, i: _entry(
            f"{prefix}_usage_percpu_jiffies_total", "counter",
            F.map_concat(base, F.create_map(
                F.lit("cpu"), i.cast("string"))),
            v,
        ),
    )


def parse_ecs_stats(df: DataFrame, col: str = "body",
                    namespace: str = "awsecs") -> DataFrame:
    """One stats-endpoint response body per row → long metric frame.

    Output columns appended: ``container_id, name, namespace, kind,
    metric_type, tags, event_ts, value`` (null-valued fields skipped,
    matching the reference's Option handling)."""
    parsed = df.select(
        "*", F.explode(F.from_json(F.col(col), STATS_SCHEMA))
        .alias("cid", "cs")
    )
    cs = F.col("cs")
    base = F.map_concat(
        F.create_map(F.lit("container_id"), F.col("cid")),
        F.when(
            cs["name"].isNotNull(),
            F.create_map(F.lit("container_name"), cs["name"]),
        ).otherwise(F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )),
    )
    rowed = parsed.select(
        "*", base.alias("_base"),
        F.to_timestamp(
            F.regexp_replace(cs["read"], r"(\.\d{6})\d*Z$", "$1Z"),
            "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'",
        ).alias("_ts"),
    )
    base_c = F.col("_base")
    cs = F.col("cs")

    fixed: list[Column] = []
    fixed += _cpu_entries(cs["cpu_stats"], "cpu", base_c)
    fixed += _cpu_entries(cs["precpu_stats"], "precpu", base_c)
    for fld, name in _MEM_GAUGES_TOP:
        fixed.append(_entry(f"memory_{name}", "gauge", base_c,
                            cs["memory_stats"][fld]))
    for fld, name in _MEM_GAUGES:
        fixed.append(_entry(f"memory_{name}", "gauge", base_c,
                            cs["memory_stats"]["stats"][fld]))
    for fld, name in _MEM_COUNTERS:
        fixed.append(_entry(f"memory_{name}", "counter", base_c,
                            cs["memory_stats"]["stats"][fld]))
    fixed_arr = F.filter(F.array(*fixed),
                         lambda x: x["value"].isNotNull())

    def blkio_arr(fld: str, suffix: str, div: int) -> Column:
        lst = F.coalesce(
            cs["blkio_stats"][fld],
            F.array().cast(_BLKIO_LIST),
        )
        return F.transform(
            lst,
            lambda s: _entry(
                f"blkio_{suffix}", "counter",
                F.map_concat(base_c, F.create_map(
                    F.lit("device"),
                    F.concat(s["major"].cast("string"), F.lit(":"),
                             s["minor"].cast("string")),
                    F.lit("op"), F.lower(s["op"]),
                )),
                s["value"] / div if div != 1 else s["value"],
            ),
        )

    blkio = F.concat(*[blkio_arr(f, sfx, d) for f, sfx, d in _BLKIO])

    net_entries = F.flatten(F.transform(
        F.map_entries(F.coalesce(
            cs["networks"],
            F.expr(f"CAST(map() AS {_net_map_type()})"),
        )),
        lambda e: F.filter(
            F.array(*[
                _entry(
                    f"network_{name}", "counter",
                    F.map_concat(base_c, F.create_map(
                        F.lit("device"), e["key"])),
                    e["value"][fld],
                )
                for fld, name in _NET
            ]),
            lambda x: x["value"].isNotNull(),
        ),
    ))

    percpu = F.concat(
        _percpu_entries(cs["cpu_stats"], "cpu", base_c),
        _percpu_entries(cs["precpu_stats"], "precpu", base_c),
    )

    all_entries = F.concat(fixed_arr, blkio, percpu, net_entries)
    out = rowed.select("*", F.explode(all_entries).alias("_m"))
    keep = [c for c in df.columns]
    return out.select(
        *keep,
        F.col("cid").alias("container_id"),
        F.col("_m.name").alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit("absolute").alias("kind"),
        F.col("_m.metric_type").alias("metric_type"),
        F.col("_m.tags").alias("tags"),
        F.col("_ts").alias("event_ts"),
        F.col("_m.value").alias("value"),
    )


def _net_map_type() -> str:
    return ("map<string, struct<rx_bytes: double, rx_packets: double,"
            " rx_errors: double, rx_dropped: double, tx_bytes: double,"
            " tx_packets: double, tx_errors: double, tx_dropped: double>>")
