"""apache_metrics / nginx_metrics sources — server-status text parsers.

Parity: reference ``src/sources/apache_metrics/parser.rs`` (Apache httpd
mod_status ``?auto`` machine-readable page) and
``src/sources/nginx_metrics/parser.rs`` + ``mod.rs:236-242`` (NGINX
stub_status page). The HTTP scrape loop is the cluster scheduler's job
(micro-batch re-scrape, like the exec source); what this module rebuilds
is the parse: one input row per scraped status BODY → a long normalized
metric frame, all pure JVM regex/column math (no UDFs — a body is one
row, so the explode fan-out is bounded by the fixed metric list).

Output columns appended to the input row: ``name, namespace, kind,
metric_type, tag_key, tag_val, value`` — kind is always ``absolute``
(both references emit MetricKind::Absolute); at most one extra tag per
metric, exactly mirroring the reference's tag ``replace`` calls.

Apache field map (parser.rs:150-385):

* ServerUptimeSeconds → counter ``uptime_seconds_total``
* Total Accesses → counter ``access_total``
* Total kBytes → counter ``sent_bytes_total`` (value × 1024)
* Total Duration → counter ``duration_seconds_total``
* CPUUser/CPUSystem/CPUChildrenUser/CPUChildrenSystem → gauge
  ``cpu_seconds_total`` tagged ``type=user|system|children_user|
  children_system``
* CPULoad → gauge ``cpu_load``
* IdleWorkers/BusyWorkers → gauge ``workers`` tagged ``state=idle|busy``
* ConnsTotal/ConnsAsyncWriting/ConnsAsyncKeepAlive/ConnsAsyncClosing →
  gauge ``connections`` tagged ``state=total|writing|keepalive|closing``
* Scoreboard → 11 gauge ``scoreboard`` rows tagged with every state name
  (parser.rs SCOREBOARD char map), count 0 when the char is absent.

NGINX stub_status map (mod.rs:236-242): ``connections_active`` gauge,
``connections_accepted_total`` / ``connections_handled_total`` /
``http_requests_total`` counters, ``connections_reading`` /
``connections_writing`` / ``connections_waiting`` gauges.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parser.rs SCOREBOARD: char → state tag value.
SCOREBOARD = [
    ("_", "waiting"), ("S", "starting"), ("R", "reading"), ("W", "sending"),
    ("K", "keepalive"), ("D", "dnslookup"), ("C", "closing"),
    ("L", "logging"), ("G", "finishing"), ("I", "idle_cleanup"),
    (".", "open"),
]

# (status key, metric name, metric_type, (tag_key, tag_val) | None, scale)
APACHE_FIELDS = [
    ("ServerUptimeSeconds", "uptime_seconds_total", "counter", None, 1),
    ("Total Accesses", "access_total", "counter", None, 1),
    ("Total kBytes", "sent_bytes_total", "counter", None, 1024),
    ("Total Duration", "duration_seconds_total", "counter", None, 1),
    ("CPUUser", "cpu_seconds_total", "gauge", ("type", "user"), 1),
    ("CPUSystem", "cpu_seconds_total", "gauge", ("type", "system"), 1),
    ("CPUChildrenUser", "cpu_seconds_total", "gauge",
     ("type", "children_user"), 1),
    ("CPUChildrenSystem", "cpu_seconds_total", "gauge",
     ("type", "children_system"), 1),
    ("CPULoad", "cpu_load", "gauge", None, 1),
    ("IdleWorkers", "workers", "gauge", ("state", "idle"), 1),
    ("BusyWorkers", "workers", "gauge", ("state", "busy"), 1),
    ("ConnsTotal", "connections", "gauge", ("state", "total"), 1),
    ("ConnsAsyncWriting", "connections", "gauge", ("state", "writing"), 1),
    ("ConnsAsyncKeepAlive", "connections", "gauge",
     ("state", "keepalive"), 1),
    ("ConnsAsyncClosing", "connections", "gauge", ("state", "closing"), 1),
]

NGINX_FIELDS = [
    ("connections_active", "gauge"),
    ("connections_accepted_total", "counter"),
    ("connections_handled_total", "counter"),
    ("http_requests_total", "counter"),
    ("connections_reading", "gauge"),
    ("connections_writing", "gauge"),
    ("connections_waiting", "gauge"),
]


def _metric_struct(name: str, metric_type: str, tag: tuple[str, str] | None,
                   value: Column) -> Column:
    return F.struct(
        F.lit(name).alias("name"),
        F.lit(metric_type).alias("metric_type"),
        F.lit(tag[0] if tag else None).cast("string").alias("tag_key"),
        F.lit(tag[1] if tag else None).cast("string").alias("tag_val"),
        value.cast("double").alias("value"),
    )


def _explode_metrics(df: DataFrame, entries: list[Column],
                     namespace: str) -> DataFrame:
    arr = F.filter(F.array(*entries), lambda x: x["value"].isNotNull())
    out = df.select("*", F.explode(arr).alias("_m"))
    return out.select(
        *[c for c in df.columns],
        F.col("_m.name").alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit("absolute").alias("kind"),
        F.col("_m.metric_type").alias("metric_type"),
        F.col("_m.tag_key").alias("tag_key"),
        F.col("_m.tag_val").alias("tag_val"),
        F.col("_m.value").alias("value"),
    )


def parse_apache_status(df: DataFrame, col: str = "body",
                        namespace: str = "apache") -> DataFrame:
    """mod_status ``?auto`` body → long metric frame (see module doc)."""
    c = F.col(col)
    entries: list[Column] = []
    for key, name, mtype, tag, scale in APACHE_FIELDS:
        raw = F.regexp_extract(c, rf"(?m)^{re.escape(key)}: (.+)$", 1)
        val = F.nullif(raw, F.lit("")).cast("double")
        if scale != 1:
            val = val * scale
        entries.append(_metric_struct(name, mtype, tag, val))
    sb = F.nullif(
        F.regexp_extract(c, r"(?m)^Scoreboard: (.+)$", 1), F.lit("")
    )
    for ch, state in SCOREBOARD:
        cnt = F.when(
            sb.isNotNull(),
            F.length(sb) - F.length(F.replace(sb, F.lit(ch), F.lit(""))),
        )
        entries.append(
            _metric_struct("scoreboard", "gauge", ("state", state), cnt)
        )
    return _explode_metrics(df, entries, namespace)


def parse_nginx_stub_status(df: DataFrame, col: str = "body",
                            namespace: str = "nginx") -> DataFrame:
    """stub_status body → long metric frame (see module doc)."""
    c = F.col(col)
    active = F.nullif(
        F.regexp_extract(c, r"Active connections: (\d+)", 1), F.lit("")
    )
    ahr = [
        F.nullif(
            F.regexp_extract(
                c, r"server accepts handled requests\s*\n\s*(\d+) (\d+) (\d+)",
                i,
            ),
            F.lit(""),
        )
        for i in (1, 2, 3)
    ]
    rww = [
        F.nullif(
            F.regexp_extract(
                c, r"Reading: (\d+) Writing: (\d+) Waiting: (\d+)", i
            ),
            F.lit(""),
        )
        for i in (1, 2, 3)
    ]
    values = [active, ahr[0], ahr[1], ahr[2], rww[0], rww[1], rww[2]]
    entries = [
        _metric_struct(name, mtype, None, val)
        for (name, mtype), val in zip(NGINX_FIELDS, values)
    ]
    return _explode_metrics(df, entries, namespace)
