"""Prometheus scrape-source decode: exposition text → metric events.

Parity: reference ``src/sources/prometheus/parser.rs`` (reparse_groups)
over ``lib/prometheus-parser``:

- sample lines ``name{labels} value [timestamp_ms]`` plus ``# TYPE``
  comments; HELP/other comments ignored;
- counter/gauge/untyped → one metric per sample (untyped when no TYPE
  declaration matches — lib.rs GroupKind::Untyped);
- histogram families regroup ``_bucket``/``_sum``/``_count`` samples by
  their label set minus ``le``: buckets sort by ``le``, de-accumulate
  (cumulative text counts → per-bucket, saturating at 0), and the
  ``+Inf`` bucket drops (parser.rs GroupKind::Histogram arm — count
  carries the total), producing the same non-cumulative bucket shape
  ``sinks/prometheus.py`` encodes back out;
- summary families regroup ``{quantile=…}`` samples plus
  ``_sum``/``_count`` by label set minus ``quantile`` (quantile VALUES
  are not cumulative — kept as-is, parser.rs GroupKind::Summary);
- label values unescape ``\\\\``, ``\\"``, ``\\n`` (the exposition
  format's three escapes); sample values accept ``+Inf``/``-Inf``/
  ``NaN``.

Family resolution uses metric-name equality against the TYPE
declarations (exact name first, then the ``_bucket``/``_sum``/``_count``
-stripped base for histogram/summary types). The exposition format
requires each family's samples to share the declared name, so this is
the grouping the line-oriented reference parser computes with its
ordered group state — name equality is the distributed equivalent.

All JVM column expressions; the TYPE dimension is broadcast (a scrape
has few families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NAME = r"[a-zA-Z_:][a-zA-Z0-9_:]*"
SAMPLE_RE = rf"^({NAME})(?:\{{(.*)\}})?\s+(\S+)(?:\s+(-?\d+))?\s*$"
TYPE_RE = rf"^#\s*TYPE\s+({NAME})\s+([a-z]+)\s*$"
PAIR_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"((?:[^"\\]|\\.)*)"'

_SENTINEL = "\x00"


def _unescape(v: Column) -> Column:
    """Exposition label-value escapes: ``\\\\`` ``\\"`` ``\\n``."""
    v = F.regexp_replace(v, r"\\\\", _SENTINEL)
    v = F.regexp_replace(v, r"\\n", "\n")
    v = F.regexp_replace(v, r'\\"', '"')
    return F.regexp_replace(v, _SENTINEL, r"\\")


def _num(v: Column) -> Column:
    """Sample/le number: +Inf/-Inf/NaN per the exposition format."""
    return (
        F.when(v.isin("+Inf", "Inf"), F.lit(float("inf")))
        .when(v == "-Inf", F.lit(float("-inf")))
        .when(v == "NaN", F.lit(float("nan")))
        .otherwise(v.try_cast("double"))
    )


def _tags_key(tags: Column) -> Column:
    """Canonical grouping key over a label map (sorted entries)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(tags)),
            lambda e: F.concat(e["key"], F.lit("\x01"), e["value"]),
        ),
        "\x02",
    )


_OUT_COLS = (
    "name", "kind", "tags", "value", "buckets",
    "count", "sum", "quantiles", "timestamp_ms",
)


def parse_prometheus_text(
    df: DataFrame, line: str | Column = "value"
) -> DataFrame:
    """Decode exposition-format lines (one per row) into one row per
    metric: simple kinds per sample; histogram/summary families
    regrouped with de-accumulated buckets / raw quantiles."""
    col = F.col(line) if isinstance(line, str) else line
    lines = df.select(col.alias("__line"))

    types = (
        lines.select(
            F.regexp_extract("__line", TYPE_RE, 1).alias("tname"),
            F.regexp_extract("__line", TYPE_RE, 2).alias("mtype"),
        )
        .filter(F.col("tname") != "")
        .distinct()
    )

    s = lines.filter(
        ~F.col("__line").startswith("#") & F.col("__line").rlike(SAMPLE_RE)
    ).select(
        F.regexp_extract("__line", SAMPLE_RE, 1).alias("sname"),
        F.regexp_extract("__line", SAMPLE_RE, 2).alias("body"),
        _num(F.regexp_extract("__line", SAMPLE_RE, 3)).alias("value"),
        F.nullif(F.regexp_extract("__line", SAMPLE_RE, 4), F.lit(""))
        .try_cast("long").alias("timestamp_ms"),
    )
    s = s.withColumn(
        "tags",
        F.map_from_arrays(
            F.regexp_extract_all("body", F.lit(PAIR_RE), F.lit(1)),
            F.transform(
                F.regexp_extract_all("body", F.lit(PAIR_RE), F.lit(2)),
                _unescape,
            ),
        ),
    ).drop("body")
    s = s.withColumn(
        "base", F.regexp_replace("sname", "(_bucket|_sum|_count)$", "")
    )

    te = types.select(
        F.col("tname").alias("e_name"), F.col("mtype").alias("e_type")
    )
    tb = types.filter(F.col("mtype").isin("histogram", "summary")).select(
        F.col("tname").alias("b_name"), F.col("mtype").alias("b_type")
    )
    s = (
        s.join(F.broadcast(te), s["sname"] == te["e_name"], "left")
        .join(F.broadcast(tb), s["base"] == tb["b_name"], "left")
        .select(
            "sname", "value", "timestamp_ms", "tags",
            F.coalesce("e_name", "b_name", "sname").alias("name"),
            F.coalesce("e_type", "b_type", F.lit("untyped")).alias("kind"),
        )
    )

    null_d = F.lit(None).cast("double")
    null_buckets = F.lit(None).cast(
        "array<struct<le:double,count:double>>"
    )
    null_quant = F.lit(None).cast(
        "array<struct<quantile:double,value:double>>"
    )

    simple = s.filter(
        ~F.col("kind").isin("histogram", "summary")
    ).select(
        "name", "kind", "tags", "value",
        null_buckets.alias("buckets"), null_d.alias("count"),
        null_d.alias("sum"), null_quant.alias("quantiles"),
        "timestamp_ms",
    )

    def _family(kind: str, extra_tag: str, agg_rows: DataFrame) -> DataFrame:
        role = (
            F.when(F.col("sname").endswith("_bucket"), F.lit("bucket"))
            .when(F.col("sname").endswith("_sum"), F.lit("sum"))
            .when(F.col("sname").endswith("_count"), F.lit("count"))
            .otherwise(F.lit("q"))  # bare summary quantile sample
        )
        g = agg_rows.select(
            "name", "value", "timestamp_ms", role.alias("role"),
            _num(F.col("tags")[extra_tag]).alias("extra"),
            F.map_filter(
                F.col("tags"), lambda k, _: k != extra_tag
            ).alias("gtags"),
        )
        return (
            g.withColumn("gkey", _tags_key(F.col("gtags")))
            .groupBy("name", "gkey")
            .agg(
                F.first("gtags").alias("tags"),
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("role") == ("bucket" if kind == "histogram" else "q"),
                            F.struct(
                                F.col("extra").alias("x"),
                                F.col("value").alias("v"),
                            ),
                        )
                    )
                ).alias("pts"),
                F.max(F.when(F.col("role") == "count", F.col("value")))
                .alias("count"),
                F.max(F.when(F.col("role") == "sum", F.col("value")))
                .alias("sum"),
                F.max("timestamp_ms").alias("timestamp_ms"),
            )
        )

    hist_rows = s.filter(F.col("kind") == "histogram")
    hg = _family("histogram", "le", hist_rows)
    # de-accumulate sorted cumulative buckets, drop +Inf (parser.rs)
    pts = F.col("pts")
    dec = F.transform(
        pts,
        lambda x, i: F.struct(
            x["x"].alias("le"),
            F.greatest(
                x["v"] - F.coalesce(F.get(pts, i - 1)["v"], F.lit(0.0)),
                F.lit(0.0),
            ).alias("count"),
        ),
    )
    hist = hg.select(
        "name", F.lit("histogram").alias("kind"), "tags",
        null_d.alias("value"),
        F.filter(
            dec, lambda b: b["le"] != F.lit(float("inf"))
        ).alias("buckets"),
        "count", "sum", null_quant.alias("quantiles"), "timestamp_ms",
    )

    sg = _family("summary", "quantile", s.filter(F.col("kind") == "summary"))
    summ = sg.select(
        "name", F.lit("summary").alias("kind"), "tags",
        null_d.alias("value"), null_buckets.alias("buckets"),
        "count", "sum",
        F.transform(
            F.col("pts"),
            lambda x: F.struct(
                x["x"].alias("quantile"), x["v"].alias("value")
            ),
        ).alias("quantiles"),
        "timestamp_ms",
    )

    return simple.unionByName(hist).unionByName(summ).select(*_OUT_COLS)
