"""eventstoredb_metrics source — EventStoreDB stats JSON → metric frame.

Parity: reference ``src/sources/eventstoredb_metrics/types.rs`` — the
``/stats`` endpoint's camelCase document maps to (namespace
``eventstoredb``, MetricKind::Absolute, tag ``id`` = process id):

* ``proc.mem`` → gauge ``process_memory_used_bytes``;
* ``proc.diskIo.{readBytes,writtenBytes,readOps,writeOps}`` → counters
  ``disk_read_bytes_total`` / ``disk_written_bytes_total`` /
  ``disk_read_ops_total`` / ``disk_write_ops_total``;
* ``sys.freeMem`` → gauge ``memory_free_bytes``;
* each ``sys.drive`` entry (a ``{path: stats}`` map) → gauges
  ``disk_total_bytes`` / ``disk_free_bytes`` (availableBytes) /
  ``disk_used_bytes`` with the extra ``path`` tag.

Typed ``from_json`` + bounded explode — zero Python in the plan, same
shape as sources/ecs_metrics.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATS_SCHEMA = """struct<
  proc: struct<id: bigint, mem: double,
    diskIo: struct<readBytes: double, writtenBytes: double,
                   readOps: double, writeOps: double>>,
  sys: struct<freeMem: double,
    drive: map<string, struct<availableBytes: double, totalBytes: double,
                              usedBytes: double>>>>"""

_PROC = [  # (field path builder, metric name, metric_type)
    (lambda s: s["proc"]["mem"], "process_memory_used_bytes", "gauge"),
    (lambda s: s["proc"]["diskIo"]["readBytes"],
     "disk_read_bytes_total", "counter"),
    (lambda s: s["proc"]["diskIo"]["writtenBytes"],
     "disk_written_bytes_total", "counter"),
    (lambda s: s["proc"]["diskIo"]["readOps"],
     "disk_read_ops_total", "counter"),
    (lambda s: s["proc"]["diskIo"]["writeOps"],
     "disk_write_ops_total", "counter"),
    (lambda s: s["sys"]["freeMem"], "memory_free_bytes", "gauge"),
]

_DRIVE = [("totalBytes", "disk_total_bytes"),
          ("availableBytes", "disk_free_bytes"),
          ("usedBytes", "disk_used_bytes")]


def parse_esdb_stats(df: DataFrame, col: str = "body",
                     namespace: str = "eventstoredb") -> DataFrame:
    """One stats document per row → long metric frame (columns appended:
    ``name, namespace, kind, metric_type, tags, value``)."""
    parsed = df.select(
        "*", F.from_json(F.col(col), STATS_SCHEMA).alias("_s")
    )
    s = F.col("_s")
    base = F.create_map(F.lit("id"), s["proc"]["id"].cast("string"))

    def entry(name, mtype: str, tags: Column, value: Column) -> Column:
        return F.struct(
            F.lit(name).alias("name"), F.lit(mtype).alias("metric_type"),
            tags.alias("tags"), value.cast("double").alias("value"),
        )

    fixed = F.filter(
        F.array(*[entry(n, t, base, fn(s)) for fn, n, t in _PROC]),
        lambda x: x["value"].isNotNull(),
    )
    drives = F.flatten(F.transform(
        F.map_entries(F.coalesce(
            s["sys"]["drive"],
            F.expr(
                "CAST(map() AS map<string, struct<availableBytes: double,"
                " totalBytes: double, usedBytes: double>>)"
            ),
        )),
        lambda e: F.filter(
            F.array(*[
                entry(
                    name, "gauge",
                    F.map_concat(base, F.create_map(
                        F.lit("path"), e["key"])),
                    e["value"][fld],
                )
                for fld, name in _DRIVE
            ]),
            lambda x: x["value"].isNotNull(),
        ),
    ))
    out = parsed.select("*", F.explode(F.concat(fixed, drives)).alias("_m"))
    return out.select(
        *[c for c in df.columns],
        F.col("_m.name").alias("name"),
        F.lit(namespace).alias("namespace"),
        F.lit("absolute").alias("kind"),
        F.col("_m.metric_type").alias("metric_type"),
        F.col("_m.tags").alias("tags"),
        F.col("_m.value").alias("value"),
    )
