"""Prometheus exposition-format encoder (the ``prometheus_exporter`` sink's
wire format).

Parity: reference ``src/sinks/prometheus/collector.rs`` (StringCollector):

- header per family: ``# HELP <fullname> <name>`` + ``# TYPE <fullname>
  <type>`` (encode_header, :291-298), fullname = ``namespace_name``
  (encode_namespace with ``_``).
- one sample line per value: ``fullname[suffix]{k="v",...} value [ts_ms]``
  (emit_value, :239-262); label values backslash-escape ``\\`` and ``"``
  (format_tag, :299-315); labels are sorted (encode_tags, :270-289).
- counter/gauge → one line; set → cardinality as one line (collector
  encodes ``values.len()``, :54-56); aggregated histogram → CUMULATIVE
  ``_bucket`` lines per finite upper limit + ``+Inf`` + ``_sum`` +
  ``_count`` (:119-163, cumulation at :143, infinite-le skip at :139);
  aggregated summary → ``{quantile="q"}`` lines + ``_sum`` + ``_count``
  (:164-181).
- only ABSOLUTE metrics are encoded (encode_metric guard, :43) — the
  exporter normalizes incremental→absolute upstream; callers here filter
  or pre-aggregate the same way.
- family order is sorted by fullname (BTreeMap, :221-224). Line order
  within a family follows the reference's input-arrival order, which has
  no distributed analog — we canonicalize: samples sort by (label string,
  ordinal) per family; the ordinal keeps bucket/quantile lines in
  ascending le/q order and ``_sum`` before ``_count``.

Everything is a pure JVM column expression (no Python in the encode path);
number formatting matches Rust ``Display`` for the integral/fraction split
the same way the statsd encoder does (``parse._statsd_num``).

Scale: the encode is a narrow projection + explode; the only wide step is
the per-family assembly in :func:`exposition_bodies` (groupBy fullname —
family cardinality, not sample cardinality, and bounded by the metric
namespace size, so the shuffle is tiny at any corpus scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.functions.parse import _statsd_num

PROM_TYPES = {
    "counter": "counter",
    "gauge": "gauge",
    "set": "gauge",
    "histogram": "histogram",
    "summary": "summary",
}


def _esc(v: Column) -> Column:
    """Label-value escaping (format_tag): ``\\`` and ``"`` get a backslash."""
    return F.regexp_replace(v.cast("string"), r'([\\"])', r"\\$1")


def _fullname(name: Column, namespace: Column | None) -> Column:
    if namespace is None:
        return name
    return F.when(
        namespace.isNull() | (namespace == ""), name
    ).otherwise(F.concat(namespace, F.lit("_"), name))


def _labels(tags: Column | None, extra_key: Column, extra_val: Column) -> Column:
    """Sorted ``k="v"`` label block incl. the optional extra (le/quantile)
    label, ``{...}``-wrapped; empty tag set + no extra → empty string."""
    parts = F.array().cast("array<string>")
    if tags is not None:
        parts = F.when(
            tags.isNull(),
            F.array().cast("array<string>"),
        ).otherwise(
            F.transform(
                F.map_entries(tags),
                lambda e: F.concat(
                    e["key"], F.lit('="'), _esc(e["value"]), F.lit('"')
                ),
            )
        )
    with_extra = F.when(
        extra_key.isNull(), parts
    ).otherwise(
        F.array_append(
            parts,
            F.concat(extra_key, F.lit('="'), _esc(extra_val), F.lit('"')),
        )
    )
    joined = F.array_join(F.array_sort(with_extra), ",")
    return F.when(
        F.size(with_extra) > 0, F.concat(F.lit("{"), joined, F.lit("}"))
    ).otherwise(F.lit(""))


def _sample(ord_: Column, suffix: Column, extra_key: Column,
            extra_val: Column, value: Column) -> Column:
    return F.struct(
        ord_.cast("int").alias("ord"),
        suffix.alias("suffix"),
        extra_key.cast("string").alias("extra_key"),
        extra_val.cast("string").alias("extra_val"),
        value.cast("double").alias("value"),
    )


def _null() -> Column:
    # lazy: Columns cannot be built at import time (needs a live context)
    return F.lit(None).cast("string")


def prometheus_samples(
    df: DataFrame,
    name_col: str = "name",
    namespace_col: str | None = "namespace",
    type_col: str = "metric_type",
    value_col: str = "value",
    tags_col: str | None = "tags",
    ts_ms_col: str | None = None,
    buckets_col: str | None = None,
    quantiles_col: str | None = None,
    count_col: str | None = None,
    sum_col: str | None = None,
) -> DataFrame:
    """Aggregated (absolute) metric rows → one row per exposition line.

    Output: (fullname, prom_type, help_line, type_line, labels, ord, line)
    — relational form of the StringCollector output; feed to
    :func:`exposition_bodies` for the per-family text blocks, or assert
    line-level in a gate query.

    histogram rows need ``buckets_col`` = array<struct<le:double,
    count:long>> (per-bucket counts, ASCENDING le — cumulation happens
    here, collector.rs:143) plus ``count_col``/``sum_col``; summary rows
    need ``quantiles_col`` = array<struct<quantile:double,value:double>>
    plus ``count_col``/``sum_col``.
    """
    name = F.col(name_col)
    namespace = F.col(namespace_col) if namespace_col else None
    mtype = F.col(type_col)
    value = F.col(value_col).cast("double")
    tags = F.col(tags_col) if tags_col else None

    single = F.array(_sample(F.lit(0), F.lit(""), _null(), _null(), value))

    samples = single
    if buckets_col is not None:
        if count_col is None or sum_col is None:
            raise ValueError("histogram encoding needs count_col and sum_col")
        b = F.col(buckets_col)
        n_b = F.size(b)
        # cumulative bucket counts, skipping infinite upper limits
        # (collector.rs:139-151); +Inf line carries the TOTAL count
        finite = F.filter(b, lambda x: F.abs(x["le"]) != F.lit(float("inf")))
        bucket_lines = F.transform(
            finite,
            lambda x, i: _sample(
                i,
                F.lit("_bucket"),
                F.lit("le"),
                _statsd_num(x["le"]),
                F.aggregate(
                    F.slice(finite, F.lit(1), i + 1),
                    F.lit(0).cast("long"),
                    lambda acc, y: acc + y["count"],
                ),
            ),
        )
        hist = F.concat(
            bucket_lines,
            F.array(
                _sample(n_b + 1, F.lit("_bucket"), F.lit("le"),
                        F.lit("+Inf"), F.col(count_col)),
                _sample(n_b + 2, F.lit("_sum"), _null(), _null(), F.col(sum_col)),
                _sample(n_b + 3, F.lit("_count"), _null(), _null(),
                        F.col(count_col)),
            ),
        )
        samples = F.when(mtype == "histogram", hist).otherwise(samples)
    if quantiles_col is not None:
        if count_col is None or sum_col is None:
            raise ValueError("summary encoding needs count_col and sum_col")
        q = F.col(quantiles_col)
        q_lines = F.transform(
            q,
            lambda x, i: _sample(
                i, F.lit(""), F.lit("quantile"),
                _statsd_num(x["quantile"]), x["value"],
            ),
        )
        summ = F.concat(
            q_lines,
            F.array(
                _sample(F.size(q) + 1, F.lit("_sum"), _null(), _null(),
                        F.col(sum_col)),
                _sample(F.size(q) + 2, F.lit("_count"), _null(), _null(),
                        F.col(count_col)),
            ),
        )
        samples = F.when(mtype == "summary", summ).otherwise(samples)

    prom_type = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in PROM_TYPES.items() for x in kv]
        ),
        mtype,
    )
    fullname = _fullname(name, namespace)
    base = df.select(
        fullname.alias("fullname"),
        prom_type.alias("prom_type"),
        F.concat(F.lit("# HELP "), fullname, F.lit(" "), name).alias(
            "help_line"
        ),
        F.concat(F.lit("# TYPE "), fullname, F.lit(" "), prom_type).alias(
            "type_line"
        ),
        (F.col(tags_col) if tags_col else F.lit(None)).alias("__tags"),
        (F.col(ts_ms_col).cast("long") if ts_ms_col else
         F.lit(None).cast("long")).alias("__ts"),
        F.explode(samples).alias("__s"),
    )
    s = F.col("__s")
    labels = _labels(
        F.col("__tags") if tags_col else None,
        s["extra_key"], s["extra_val"],
    )
    line = F.concat(
        F.col("fullname"), s["suffix"], labels, F.lit(" "),
        _statsd_num(s["value"]),
        F.when(
            F.col("__ts").isNotNull(),
            F.concat(F.lit(" "), F.col("__ts").cast("string")),
        ).otherwise(F.lit("")),
    )
    return base.select(
        "fullname", "prom_type", "help_line", "type_line",
        labels.alias("labels"), s["ord"].alias("ord"), line.alias("line"),
    )


def exposition_bodies(samples: DataFrame) -> DataFrame:
    """Per-family exposition blocks: (fullname, body) with body =
    header lines + canonically-ordered sample lines, newline-joined with
    a trailing newline (writeln! parity). Families sort by fullname at
    render time (BTreeMap parity)."""
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("labels"), F.col("ord"), F.col("line"))
            )
        ),
        lambda x: x["line"],
    )
    return samples.groupBy("fullname", "help_line", "type_line").agg(
        F.concat(
            F.col("help_line"), F.lit("\n"), F.col("type_line"), F.lit("\n"),
            F.array_join(ordered, "\n"), F.lit("\n"),
        ).alias("body")
    ).select("fullname", "body")


def exposition(samples: DataFrame) -> str:
    """Driver-side render of the full scrape body (the exporter's HTTP
    response): family blocks concatenated in fullname order. The collect
    is over FAMILIES (bounded by the metric namespace, not event volume)
    — the same cardinality the reference holds in memory to serve /metrics."""
    rows = exposition_bodies(samples).orderBy("fullname").collect()
    return "".join(r.body for r in rows)
