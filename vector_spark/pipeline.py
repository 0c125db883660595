"""The flagship end-to-end pipeline: parse → enrich → route → aggregate.

This is the BASELINE.json north-star job over the ``sequences`` input table
(doc_id, tokens, n_tok, source): derive the synthetic log line, grok/regex
parse it (JVM regexp fast path), broadcast-join enrichment on ``source``,
predicate fan-out routing (non-exclusive reference semantics), and per-sink
tumbling-window aggregates. Mirrors the reference's regression case
``syslog → remap(parse_regex!) → log_to_metric → metrics sink``
(regression/cases/syslog_regex_logs2metric_ddmetrics/vector/vector.yaml).

Single-pass design for scale: routing emits ONE labeled frame (posexplode of
matched routes) rather than N filtered frames, so the expensive parse stage
runs once; per-sink frames are cheap filters on the label; the aggregate
stage shuffles once on (route, source, window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark import tables
from vector_spark.operators.enrich import enrich
from vector_spark.operators.route import UNMATCHED, route_label

# Non-exclusive routes over parsed fields (reference route.rs:42-49: an event
# lands in EVERY route it matches — 5xx rows appear in `errors` AND `alerts`).
# Lazy (Columns need an active session); names are fixed.
ROUTE_NAMES = ["errors", "alerts", "redirects", "ok"]


def ROUTES():
    return {
        "errors": F.col("status") >= 400,
        "alerts": (F.col("status") >= 500) & (F.col("tier") == 1),
        "redirects": (F.col("status") >= 300) & (F.col("status") < 400),
        "ok": F.col("status") < 300,
    }

AGG_WINDOW_SECS = 60


def parse_stage(seq: DataFrame) -> DataFrame:
    """sequences → + event_ts/message → parsed typed columns (flattened).

    One JVM regex pass per row: ``regexp_replace`` packs the capture groups
    into a ``\\x01``-joined string, materialized ONCE as a split array
    (CollapseProject keeps a multiply-referenced non-cheap expr as its own
    projection), then each field is a cheap ``element_at``. Only the fields
    the pipeline uses are extracted — no dead timestamp/method/protocol
    parsing in the plan (verified via .explain('formatted')).
    """
    from vector_spark.functions.parse import COMMON_LOG_RE, _CLF_SEP

    df = tables.with_message(seq)  # adds event_ts + message
    packed = F.regexp_replace(
        F.col("message"), COMMON_LOG_RE, _CLF_SEP.join(f"${i}" for i in range(1, 10))
    )
    df = df.withColumn(
        "__parts", F.when(packed.contains(_CLF_SEP), F.split(packed, _CLF_SEP))
    )
    g = lambda i: F.element_at(F.col("__parts"), i)  # noqa: E731
    return df.select(
        "*",
        g(1).alias("host"),
        g(3).alias("user"),
        g(6).alias("path"),
        g(8).cast("int").alias("status"),
        g(9).cast("long").alias("bytes"),
    ).drop("__parts")


def parse_stage_arrow(seq: DataFrame) -> DataFrame:
    """Arrow-batched pandas-UDF variant of parse_stage: the grok pattern is
    expanded once on the driver and executed as ONE vectorized
    ``str.extract`` per Arrow batch (zero per-row Python — the batch is the
    unit). Same output schema as parse_stage.

    bench.py --parse arrow measures it against the JVM path; the JVM
    regexp path wins on this workload (no Arrow serialization of the fat
    token arrays across the process boundary), which is why parse_stage is
    the default — the Arrow path is the template for parses Spark's regex
    family genuinely cannot express (lookbehind-heavy grok, per-row
    pattern dispatch).
    """
    from vector_spark.functions.grok import grok_extract

    df = tables.with_message(seq)
    pat = (
        "%{IPORHOST:host} %{NOTSPACE:ident} %{NOTSPACE:user} "
        r"\[%{DATA:ts}\] \"%{METHOD:method} %{NOTSPACE:path} %{DATA:protocol}\" "
        "%{INT:status} %{NOTSPACE:bytes}"
    )
    p = grok_extract(F.col("message"), pat)
    return df.withColumn("__p", p).select(
        "*",
        F.col("__p.host").alias("host"),
        F.col("__p.user").alias("user"),
        F.col("__p.path").alias("path"),
        F.col("__p.status").cast("int").alias("status"),
        F.col("__p.bytes").cast("long").alias("bytes"),
    ).drop("__p")


def enrich_stage(parsed: DataFrame, dim: DataFrame) -> DataFrame:
    """Broadcast lookup enrichment on the (skewed) ``source`` key — broadcast
    join means the hot 45%-'app' key never shuffles (SURVEY.md §4 skew row)."""
    return enrich(parsed, dim, on=["source"])


def route_stage(enriched: DataFrame) -> DataFrame:
    """Single-pass non-exclusive routing → one frame with a ``route`` label."""
    return route_label(enriched, ROUTES())


def aggregate_stage(routed: DataFrame) -> DataFrame:
    """Per-sink tumbling-window aggregate (≙ log_to_metric + aggregate):
    counts + token volume per (route, source, team, window)."""
    return (
        routed.groupBy(
            "route",
            "source",
            "team",
            F.window("event_ts", f"{AGG_WINDOW_SECS} seconds").alias("__w"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("n_tok").alias("tokens_total"),
            F.avg("bytes").alias("bytes_avg"),
        )
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w")
    )


def run_pipeline(
    seq: DataFrame, dim: DataFrame, parse: str = "jvm"
) -> dict[str, DataFrame]:
    """Full pipeline; returns the routed event frame and the aggregate frame.

    ``routed`` preserves the full token arrays per routed row (the
    correctness invariant: routed-row token-array equality); ``agg`` is the
    per-sink windowed aggregate (count equality invariant).
    ``parse``: 'jvm' (default regexp path) or 'arrow' (pandas-UDF grok).
    """
    parsed = (parse_stage if parse == "jvm" else parse_stage_arrow)(seq)
    enriched = enrich_stage(parsed, dim)
    routed = route_stage(enriched)
    # del(.message) after parse — the ubiquitous reference remap step: the
    # raw line (and the parse-only string fields) must not ride through the
    # route explode, which COPIES every byte once per matched route. The
    # narrower projection also lets Catalyst prune those columns below the
    # Generate, so sink rows carry only the delivery payload + agg keys.
    routed = routed.select(
        "route", "doc_id", "tokens", "n_tok", "source", "team", "tier",
        "event_ts", "status", "bytes",
    )
    return {"routed": routed, "agg": aggregate_stage(routed)}


def stream_pipeline(
    seq_stream: DataFrame,
    dim: DataFrame,
    watermark: str = "2 minutes",
) -> dict[str, DataFrame]:
    """Streaming flagship: the SAME parse/enrich/route stages (they are
    pure column transforms — batch/stream agnostic), with an event-time
    watermarked windowed aggregate. ``seq_stream`` is a streaming frame of
    the sequences schema (e.g. ``spark.readStream.schema(...).parquet``).
    Returns {'routed': append-able stream, 'agg': watermarked windowed agg}.
    """
    routed = route_stage(enrich_stage(parse_stage(seq_stream), dim))
    agg = (
        routed.withWatermark("event_ts", watermark)
        .groupBy(
            "route",
            "source",
            F.window("event_ts", f"{AGG_WINDOW_SECS} seconds").alias("__w"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("n_tok").alias("tokens_total"),
        )
        .select(F.col("__w.start").alias("window_start"), "route", "source",
                "events", "tokens_total")
    )
    return {"routed": routed, "agg": agg}


def sink_frames(routed: DataFrame) -> dict[str, DataFrame]:
    """Split the labeled frame into per-sink frames (cheap label filters)."""
    names = ROUTE_NAMES + [UNMATCHED]
    return {n: routed.filter(F.col("route") == n) for n in names}
