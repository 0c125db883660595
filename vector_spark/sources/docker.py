"""docker_logs source — Docker API log stream → annotated events.

Parity: reference ``src/sources/docker_logs/mod.rs``. The reference
tails the Docker daemon's ``/containers/{id}/logs`` endpoint; the
engine-shaped analog takes (a) a container-metadata frame (the
``/containers/json`` listing: ``container_id, name, image, labels,
created_at``) and (b) a raw log frame (``container_id, stream,
line_no, message`` where ``message`` is the API's
``timestamps: true`` wire line), and reproduces the source's pipeline:

* **container selection** (mod.rs:196-219):
  ``include_containers`` / ``exclude_containers`` are PREFIX matches on
  the container id or name (the reference comments "Starts with
  actually"); exclusion wins over inclusion. ``include_labels`` uses
  the Docker label-filter syntax (``key`` = present, ``key=value`` =
  exact); ``include_images`` matches the image name with or without a
  tag.
* **wire-line decode** (``new_event``, mod.rs:976-1120): split on the
  first whitespace; an RFC 3339 first token becomes ``timestamp``
  (bad timestamps keep the whole line and a null timestamp); one
  trailing ``\\n`` (then ``\\r``) is stripped, and a line WITHOUT the
  trailing newline is a 16 KiB-split partial (mod.rs:1060-1076).
* **auto_partial_merge** (mod.rs:1167-1220 +
  lib/vector-core/src/event/log_event.rs:505-518): within
  (container, stream) in order, each maximal ``P…PF`` run concatenates
  messages with NO separator into the FIRST event of the run (only the
  message field merges; a trailing run with no final line stays
  ``partial = true``). With ``auto_partial_merge = false`` the rows
  pass through and partial rows carry the marker field
  (``_partial`` by default, mod.rs:137-142).
* **annotation** (mod.rs:1083-1140): ``container_id``, ``image``,
  ``container_name``, ``container_created_at``, the ``label`` map,
  ``stream``, ``host``, ``source_type = "docker_logs"``.

Pure column math + one window/groupBy for the merge; the metadata join
broadcasts (a Docker host has O(100) containers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RFC3339 = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"
)


def container_included(
    containers: DataFrame,
    include_containers: list[str] | None = None,
    exclude_containers: list[str] | None = None,
    include_labels: list[str] | None = None,
    include_images: list[str] | None = None,
) -> DataFrame:
    """Filter the container listing the way the source decides which
    containers to watch (mod.rs:196-219 + the docker API filters at
    :408-426)."""
    cid, name = F.col("container_id"), F.col("name")

    def prefix_any(items: list[str]):
        cond = F.lit(False)
        for it in items:
            cond = cond | cid.startswith(it) | name.startswith(it)
        return cond

    keep = F.lit(True)
    if include_containers is not None:
        keep = keep & prefix_any(include_containers)
    if exclude_containers is not None:
        keep = keep & ~prefix_any(exclude_containers)
    if include_labels is not None:
        lab = F.lit(False)
        for it in include_labels:
            if "=" in it:
                k, v = it.split("=", 1)
                lab = lab | (F.col("labels")[k] == v)
            else:
                lab = lab | F.col("labels")[it].isNotNull()
        keep = keep & lab
    if include_images is not None:
        img = F.lit(False)
        for it in include_images:
            img = img | (F.col("image") == it)
            if ":" not in it:  # untagged filter matches any tag
                img = img | F.col("image").startswith(it + ":")
        keep = keep & img
    return containers.filter(keep)


def parse_docker_log_output(df: DataFrame,
                            col: str = "message") -> DataFrame:
    """Decode the ``timestamps: true`` wire line: leading RFC 3339
    token → ``timestamp`` (kept in the message on parse failure, like
    the reference's continue-without-timestamp path), trailing
    ``\\n``/``\\r\\n`` stripped, ``partial`` = no trailing newline."""
    raw = F.col(col)
    first = F.substring_index(raw, " ", 1)
    has_ts = first.rlike(_RFC3339)
    body = F.when(
        has_ts, F.expr(f"substring({col}, length(substring_index({col},"
                       f" ' ', 1)) + 2)")
    ).otherwise(raw)
    partial = ~body.endswith("\n")
    stripped = F.regexp_replace(body, r"\r?\n$", "")
    return df.select(
        "*",
        F.when(has_ts, F.to_timestamp(first)).alias("timestamp"),
        stripped.alias("__msg"),
        partial.alias("partial"),
    ).drop(col).withColumnRenamed("__msg", col)


def merge_partial_events(
    df: DataFrame,
    order_col: str = "line_no",
    auto_partial_merge: bool = True,
    partial_event_marker_field: str | None = "_partial",
) -> DataFrame:
    """auto_partial_merge over (container_id, stream): concatenate each
    ``P…PF`` run's messages (no separator) into the run's first event
    (only the message merges — mod.rs:1167-1220). When disabled, rows
    pass through; partial rows carry the marker field when one is
    configured."""
    if not auto_partial_merge:
        out = df
        if partial_event_marker_field:
            out = out.withColumn(
                partial_event_marker_field,
                F.when(F.col("partial"), F.lit(True)))
        return out
    w = (
        Window.partitionBy("container_id", "stream")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_final = (~F.col("partial")).cast("long")
    g = df.withColumn("__grp",
                      F.coalesce(F.sum(is_final).over(w), F.lit(0)))
    agg = g.groupBy("container_id", "stream", "__grp").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col(order_col).alias("o"),
            F.col("message").alias("m"),
            F.col("partial").alias("p"),
            F.col("timestamp").alias("t"),
        ))).alias("runs")
    )
    first = F.element_at("runs", 1)
    return agg.select(
        "container_id", "stream",
        first["o"].alias(order_col),
        first["t"].alias("timestamp"),
        F.array_join(F.transform(F.col("runs"), lambda r: r["m"]),
                     "").alias("message"),
        F.element_at("runs", -1)["p"].alias("partial"),
    )


def annotate_containers(logs: DataFrame, containers: DataFrame,
                        hostname: str | None = None) -> DataFrame:
    """Attach the watched container's metadata to each event with the
    reference's field names (mod.rs:1083-1140). Broadcast join — the
    container listing is O(100) rows per host."""
    meta = containers.select(
        "container_id",
        F.col("name").alias("container_name"),
        "image",
        F.col("created_at").alias("container_created_at"),
        F.col("labels").alias("label"),
    )
    out = logs.join(F.broadcast(meta), "container_id", "inner")
    if hostname is not None:
        out = out.withColumn("host", F.lit(hostname))
    return out.withColumn("source_type", F.lit("docker_logs"))
