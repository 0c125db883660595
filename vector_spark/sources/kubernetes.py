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


# --- pod-metadata annotation (path identity + dim equality join) -----------

_LOG_PATH_RE = r"^.*/([^/_]*)_([^/_]*)_([^/]*)/([^/]+)/[^/]+$"


def parse_log_file_path(path: Column | str) -> Column:
    """``/var/log/pods/<ns>_<pod>_<uid>/<container>/N.log`` → struct of
    (pod_namespace, pod_name, pod_uid, container_name).

    Parity: reference path_helpers.rs::parse_log_file_path — rsplit on
    '/' for (file, container, pod_dir), rsplit the pod dir on '_' for
    (uid, name, namespace); the uid group here is greedy-from-the-right
    so underscores inside the uid never shift the split."""
    p = F.col(path) if isinstance(path, str) else path
    return F.struct(
        F.regexp_extract(p, _LOG_PATH_RE, 1).alias("pod_namespace"),
        F.regexp_extract(p, _LOG_PATH_RE, 2).alias("pod_name"),
        F.regexp_extract(p, _LOG_PATH_RE, 3).alias("pod_uid"),
        F.regexp_extract(p, _LOG_PATH_RE, 4).alias("container_name"),
    )


def annotate_pod_metadata(
    df: DataFrame,
    dim: DataFrame,
    file_col: str = "file",
    prefix: str = "kubernetes.",
) -> DataFrame:
    """Annotate container log events with pod metadata — the batch twin
    of pod_metadata_annotator.rs, with the live API watch replaced by a
    dim table from ``tools/k8s_metadata_dump.py``.

    The join identity is the log-path identity the reference uses:
    (pod_namespace, pod_name, pod_uid, container_name). A pod inventory
    is thousands of rows, so the dim side is broadcast — no shuffle of
    the event stream. Emits the annotator's field set under ``prefix``
    (kubernetes.pod_name … kubernetes.container_image_id); events whose
    pod is not in the dim pass through with null metadata, exactly like
    the reference's "no pod info found" path."""
    keys = ["pod_namespace", "pod_name", "pod_uid", "container_name"]
    out_fields = [
        "pod_ip", "pod_ips", "pod_labels", "pod_annotations",
        "pod_node_name", "pod_owner", "container_image",
        "container_image_id", "container_id",
    ]
    parsed = df.withColumn("__k8s", parse_log_file_path(file_col))
    d = dim.select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in out_fields],
    )
    cond = [parsed["__k8s"][k] == d[f"__d_{k}"] for k in keys]
    joined = parsed.join(F.broadcast(d), cond, "left")
    for k in keys:
        joined = joined.withColumn(prefix + k, F.col("__k8s")[k])
    for c in out_fields:
        joined = joined.withColumn(prefix + c, F.col(f"__d_{c}"))
    return joined.drop("__k8s", *[f"__d_{k}" for k in keys],
                       *[f"__d_{c}" for c in out_fields])
