"""kubernetes_logs source decode: CRI / docker-JSON container log
formats + partial-line merging.

Parity: reference ``src/sources/kubernetes_logs``:

- CRI format (``parser/cri.rs:144``): ``<timestamp> <stdout|stderr>
  <P|F> <message>`` — delimiter-split exactly three times, the
  multiline tag must be ``P`` (partial) or ``F`` (final), a single
  trailing ``\\n`` trims off the message;
- docker JSON format (``parser/docker.rs``): ``{"log","stream","time"}``
  objects; the trailing newline trims; a message is partial when it is
  exactly 16384 bytes long and lacks the trailing newline
  (DOCKER_MESSAGE_SPLIT_THRESHOLD heuristic, docker.rs:133-155);
- partial merging (``partial_events_merger.rs``): consecutive partial
  lines of the same (file, stream) concatenate, in order and with no
  separator, into the next final line's event; a trailing unterminated
  run still emits, flagged ``partial = true`` (the reference expires it
  on a timer — a batch engine flushes it at end-of-input).

The merge is one window + one aggregation, both partitioned by
``(file, stream)`` — each container file is an independent unit, so the
shuffle distributes across files at any scale; no per-file state lives
on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRI_RE = r"^(\S+) (stdout|stderr) (P|F) (.*?)\n?$"

DOCKER_SPLIT_THRESHOLD = 16 * 1024

_DOCKER_SCHEMA = T.StructType(
    [
        T.StructField("log", T.StringType()),
        T.StructField("stream", T.StringType()),
        T.StructField("time", T.StringType()),
    ]
)


def _iso_ts(raw: Column) -> Column:
    """RFC 3339 with up to nanosecond fraction → timestamp (micros keep,
    nanos truncate — Spark timestamps are µs)."""
    cleaned = F.regexp_replace(raw, r"(\.\d{6})\d+", r"$1")
    return F.to_timestamp(cleaned)


def parse_cri(df: DataFrame, line: str | Column = "value") -> DataFrame:
    """One CRI log line → (timestamp_raw, timestamp, stream, partial,
    message); non-matching lines drop (parser emits ParserMatchError)."""
    col = F.col(line) if isinstance(line, str) else line
    keep = [c for c in df.columns] if isinstance(line, str) else df.columns
    g = lambda i: F.regexp_extract(col, CRI_RE, i)  # noqa: E731
    out = df.filter(col.rlike(CRI_RE)).select(
        *[c for c in keep if c != (line if isinstance(line, str) else None)],
        g(1).alias("timestamp_raw"),
        _iso_ts(g(1)).alias("timestamp"),
        g(2).alias("stream"),
        (g(3) == "P").alias("partial"),
        g(4).alias("message"),
    )
    return out


def parse_docker_json(
    df: DataFrame, line: str | Column = "value"
) -> DataFrame:
    """One docker JSON log object → same shape as :func:`parse_cri`,
    with the reference's length-threshold partial heuristic."""
    col = F.col(line) if isinstance(line, str) else line
    keep = [c for c in df.columns]
    rec = F.from_json(col, _DOCKER_SCHEMA)
    msg = rec["log"]
    has_nl = msg.endswith("\n")
    partial = (F.length(msg) == DOCKER_SPLIT_THRESHOLD) & ~has_nl
    out = df.select(
        *[c for c in keep if c != (line if isinstance(line, str) else None)],
        rec["time"].alias("timestamp_raw"),
        _iso_ts(rec["time"]).alias("timestamp"),
        rec["stream"].alias("stream"),
        partial.alias("partial"),
        F.regexp_replace(msg, r"\n$", "").alias("message"),
    )
    return out.filter(F.col("timestamp_raw").isNotNull())


def merge_partial_lines(
    df: DataFrame,
    order_col: str = "line_no",
    file_col: str = "file",
) -> DataFrame:
    """Merge partial runs into their final line's event
    (partial_events_merger.rs): within (file, stream) in ``order_col``
    order, each maximal ``P…PF`` run concatenates (no separator) into
    one event carrying the run's first timestamp. A trailing run with
    no final line emits with ``partial = true``."""
    w = (
        Window.partitionBy(file_col, "stream")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_final = (~F.col("partial")).cast("long")
    g = df.withColumn("__grp", F.coalesce(F.sum(is_final).over(w), F.lit(0)))
    agg = g.groupBy(file_col, "stream", "__grp").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col("message").alias("m"),
                    F.col("partial").alias("p"),
                    F.col("timestamp_raw").alias("tr"),
                    F.col("timestamp").alias("t"),
                )
            )
        ).alias("runs")
    )
    first = F.element_at("runs", 1)
    return agg.select(
        file_col,
        "stream",
        first["tr"].alias("timestamp_raw"),
        first["t"].alias("timestamp"),
        F.array_join(
            F.transform(F.col("runs"), lambda r: r["m"]), ""
        ).alias("message"),
        # every line still partial → unterminated trailing run
        F.element_at("runs", -1)["p"].alias("partial"),
    )
