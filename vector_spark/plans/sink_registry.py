"""Topology sink-type registry — every reference sink ``type`` compiles
AND executes through ``compile_config``.

Cluster contract (the 10^12-row shape), mirror-image of the source
registry's LAND-THEN-DECODE: ENCODE-THEN-SHIP. Spark executors never
hold vendor HTTP connections or broker sessions; they ENCODE the exact
wire payload (framed line, request body, or keyed object) at scan
parallelism with the SAME encoder modules the per-sink gate queries
verify bit-exact, and land it on object storage / a queue directory.
A thin transport shipper (or Structured Streaming's kafka writer where
a broker exists) moves bytes; it never re-serializes. Each handler
therefore maps the reference sink type to (encoder module × wire-unit
shape) with the reference's config keys where they affect encoding.

Handler contract::

    SINK_TYPES[type](df, cfg) -> DataFrame

The result carries one wire unit per row in column ``value:string``
(binary payloads are base64 — the shipper decodes at the transport
edge, keeping the frame a portable string column). Keyed transports
(kafka topic/key, object-store keys, redis keys, nats subjects…) add a
``__key`` string column; the topology writer partitions the landing
write by it. Body-batched HTTP sinks group rows into bounded request
bodies with a DETERMINISTIC hash-bucket batch key (no global sort, no
driver collect) — batch count scales with data volume, each groupBy is
one bounded shuffle.

Reference sink modules: src/sinks/*.rs; the type list is pinned against
website/cue/reference/components/sinks/*.cue by the registry test.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SINK_TYPES", "encode_sink", "BUILTIN_SINKS"]

# sinks handled natively by plans/topology.py write_sinks (no encoder)
BUILTIN_SINKS = {"parquet", "console", "blackhole", "memory",
                 "encoded_file", "file"}


# --- shared shapes -----------------------------------------------------------


def _b64(c: Column) -> Column:
    """Chunk-free base64 — Spark's ``base64`` may emit RFC-2045 76-char
    line chunking (legacy-conf dependent); wire payload fields must be a
    single token."""
    return F.regexp_replace(F.base64(c), "[\r\n]", "")


def _event_struct(df: DataFrame, cfg: dict) -> Column:
    """Sorted-key event object — the reference's BTreeMap LogEvent JSON
    order (file/console json codec)."""
    cols = sorted(cfg.get("fields") or df.columns)
    return F.struct(*[F.col(c) for c in cols])


def _event_json(df: DataFrame, cfg: dict) -> Column:
    return F.to_json(_event_struct(df, cfg))


def _ts(df: DataFrame, cfg: dict) -> Column:
    """Event timestamp; when the frame carries none, a FIXED epoch
    literal (the reference stamps wall-clock ingest time — a literal
    keeps retries/re-execution byte-identical, the registry's
    determinism rule)."""
    name = cfg.get("ts_field", "timestamp")
    if name not in df.columns:
        return F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    return F.col(name).cast("timestamp")


def _msg(df: DataFrame, cfg: dict) -> Column:
    return F.col(cfg.get("message_field", "message")).cast("string")


def _codec_value(df: DataFrame, cfg: dict) -> Column:
    """Generic ``encoding.codec`` dispatch for transport sinks — the
    reference's shared ``encoding`` config block (json / text / logfmt /
    csv / native_json / native / gelf / syslog). One framed line per
    event, all JVM expressions (native's protobuf frame is the one
    Arrow-batched pandas UDF, same as the codec gate queries)."""
    enc = cfg.get("encoding") or {}
    codec = enc.get("codec", cfg.get("codec", "json"))
    if codec == "json":
        return _event_json(df, cfg)
    if codec == "text":
        return _msg(df, cfg)
    if codec == "logfmt":
        from vector_spark.functions.crypto import encode_key_value

        cols = sorted(cfg.get("fields") or df.columns)
        m = F.map_from_arrays(
            F.array(*[F.lit(c) for c in cols]),
            F.array(*[F.col(c).cast("string") for c in cols]),
        )
        return encode_key_value(m)
    if codec == "csv":
        from vector_spark.functions.parse import encode_csv

        cols = enc.get("csv", {}).get("fields") or sorted(
            cfg.get("fields") or df.columns
        )
        return encode_csv([F.col(c) for c in cols])
    if codec == "native_json":
        from vector_spark.functions.native_json import encode_native_log

        return encode_native_log(_event_json(df, cfg))
    if codec == "native":
        from vector_spark.functions.native_json import encode_native_log
        from vector_spark.functions.native_proto import encode_native_proto

        return _b64(
            encode_native_proto(encode_native_log(_event_json(df, cfg)))
        )
    if codec == "gelf":
        from vector_spark.functions.parse import encode_gelf

        return encode_gelf(
            F.col(cfg.get("host_field", "host")).cast("string"),
            _msg(df, cfg),
            F.unix_seconds(_ts(df, cfg)),
            F.coalesce(
                F.col(cfg["level_field"]).cast("int")
                if cfg.get("level_field") in df.columns
                else F.lit(None).cast("int"),
                F.lit(6),
            ),
        )
    if codec == "syslog":
        from vector_spark.functions.syslog import encode_syslog_3164

        return encode_syslog_3164(
            _ts(df, cfg),
            F.col(cfg.get("host_field", "host")).cast("string"),
            F.lit(cfg.get("process", "vector")),
            _msg(df, cfg),
        )
    raise ValueError(f"unknown sink encoding codec {codec!r}")


def _batch_key(df: DataFrame, cfg: dict, obj: Column) -> Column:
    """Deterministic bounded batching for body sinks: hash-bucket the
    encoded unit. Batch count set by ``batch.buckets`` (default 16) —
    independent of row order and partitioning, so re-execution builds
    identical bodies (the retry-stability rule the skew-salting layer
    follows). ``batch_field`` names a caller-provided column to batch
    by instead (engine-portable — lets an external oracle replay the
    grouping)."""
    bf = cfg.get("batch_field")
    if bf and bf in df.columns:
        return F.col(bf).cast("string")
    n = int((cfg.get("batch") or {}).get("buckets", cfg.get("buckets", 16)))
    return F.pmod(F.xxhash64(obj), F.lit(n)).cast("int")


def _body_batches(
    df: DataFrame, obj: Column, cfg: dict,
    prefix: str, sep: str, suffix: str,
) -> DataFrame:
    """objs → one request body per deterministic batch: sort inside the
    batch (bounded by bucket size), concat with the body frame."""
    work = df.select(obj.alias("__obj"), *[
        F.col(cfg["batch_field"])
        for _ in [0]
        if cfg.get("batch_field") and cfg["batch_field"] in df.columns
    ])
    return (
        work.groupBy(_batch_key(work, cfg, F.col("__obj")).alias("__batch"))
        .agg(
            F.concat(
                F.lit(prefix),
                F.array_join(F.sort_array(F.collect_list("__obj")), sep),
                F.lit(suffix),
            ).alias("value")
        )
        .select("value")
    )


def _ndjson_batches(df: DataFrame, obj: Column, cfg: dict) -> DataFrame:
    return _body_batches(df, obj, cfg, "", "\n", "")


def _metric_struct(df: DataFrame, cfg: dict) -> dict[str, Column]:
    """The repo's normalized long metric frame (log_to_metric /
    *_metrics sources): name, namespace, metric_type, kind, value,
    event_ts, optional tags map."""
    tags_col = cfg.get("tags_field", "tags")
    return {
        "name": F.col(cfg.get("name_field", "name")).cast("string"),
        "namespace": (
            F.col("namespace").cast("string")
            if "namespace" in df.columns
            else F.lit(cfg.get("default_namespace", ""))
        ),
        "metric_type": (
            F.col("metric_type").cast("string")
            if "metric_type" in df.columns
            else F.lit("gauge")
        ),
        "kind": (
            F.col("kind").cast("string")
            if "kind" in df.columns
            else F.lit("absolute")
        ),
        "value": F.col(cfg.get("value_field", "value")).cast("double"),
        "ts": F.col(cfg.get("ts_field", "event_ts")).cast("timestamp"),
        "tags": (
            F.col(tags_col)
            if tags_col in df.columns
            else F.create_map().cast("map<string,string>")
        ),
    }


def _influx_line(df: DataFrame, cfg: dict) -> Column:
    """Shared line-protocol rendering for the influx-wire family
    (influxdb_metrics; sematext_metrics and greptimedb_metrics both
    ingest the same line protocol — src/sinks/sematext/metrics.rs,
    src/sinks/greptimedb/mod.rs)."""
    from vector_spark.functions.parse import encode_influxdb, ilp_field_float

    m = _metric_struct(df, cfg)
    measurement = F.when(
        m["namespace"] != "", F.concat(m["namespace"], F.lit("."), m["name"])
    ).otherwise(m["name"])
    return encode_influxdb(
        measurement,
        [],
        [("value", ilp_field_float(m["value"]))],
        F.unix_millis(m["ts"]) * F.lit(1_000_000),
    )


# --- handlers ----------------------------------------------------------------


def _h_framed(df: DataFrame, cfg: dict) -> DataFrame:
    """Line/frame transports: one encoded event per wire frame."""
    out = df.select(_codec_value(df, cfg).alias("value"))
    return out


def _h_keyed_framed(key_default: str) -> Callable:
    def h(df: DataFrame, cfg: dict) -> DataFrame:
        key_field = cfg.get("key_field")
        key = (
            F.col(key_field).cast("string")
            if key_field
            else F.lit(str(cfg.get("topic", cfg.get("subject",
                       cfg.get("key", key_default)))))
        )
        return df.select(
            key.alias("__key"), _codec_value(df, cfg).alias("value")
        )

    return h


def _h_object_store(df: DataFrame, cfg: dict) -> DataFrame:
    """Object-store family (aws_s3 / gcp_cloud_storage / azure_blob /
    webhdfs): key_prefix template becomes the object partition key; the
    landed write is one text object per (key, task) — the same
    templated-partition shape as sinks/writers.write_sink."""
    prefix = cfg.get("key_prefix", "date=%F/")
    if "%F" in prefix:
        key = F.concat(
            F.lit(prefix.split("%F")[0]),
            F.date_format(_ts(df, cfg), "yyyy-MM-dd"),
            F.lit(prefix.split("%F")[1]),
        )
    else:
        # {{ field }} template interpolation, as in the partitioned writer
        key = F.lit(prefix)
        for col in df.columns:
            tok = "{{ %s }}" % col
            if tok in prefix:
                a, b = prefix.split(tok, 1)
                key = F.concat(F.lit(a), F.col(col).cast("string"), F.lit(b))
    return df.select(key.alias("__key"), _codec_value(df, cfg).alias("value"))


def _h_http(df: DataFrame, cfg: dict) -> DataFrame:
    """Generic http sink: ndjson bodies (the reference's default
    json+newline framing), deterministic batches."""
    return _ndjson_batches(df, _codec_value(df, cfg), cfg)


def _h_datadog_logs(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.datadog import encode_datadog_log

    obj = encode_datadog_log(
        _msg(df, cfg),
        F.unix_millis(_ts(df, cfg)),
        F.col("status").cast("string") if "status" in df.columns else None,
        F.col("host").cast("string") if "host" in df.columns else None,
        F.lit(cfg["service"]) if cfg.get("service") else None,
        F.lit(cfg.get("source", "vector_spark")),
    )
    return _body_batches(df, obj, cfg, "[", ",", "]")


def _h_datadog_events(df: DataFrame, cfg: dict) -> DataFrame:
    """datadog_events posts ONE event per request
    (src/sinks/datadog/events/request_builder.rs): body is a single
    {"title","text","date_happened"} object."""
    title = F.col(cfg.get("title_field", "title")) \
        if cfg.get("title_field", "title") in df.columns else _msg(df, cfg)
    return df.select(
        F.to_json(
            F.struct(
                F.unix_seconds(_ts(df, cfg)).alias("date_happened"),
                _msg(df, cfg).alias("text"),
                title.cast("string").alias("title"),
            )
        ).alias("value")
    )


def _h_datadog_traces(df: DataFrame, cfg: dict) -> DataFrame:
    """datadog_traces (src/sinks/datadog/traces/request_builder.rs):
    APM payload of traces, each a span list. Input: one span per row
    with trace_id/span_id/resource/duration_ns columns; body groups
    spans per trace — the natural key, bounded by trace width."""
    span = F.to_json(
        F.struct(
            F.col(cfg.get("duration_field", "duration_ns")).cast("long")
            .alias("duration"),
            F.col(cfg.get("resource_field", "resource")).cast("string")
            .alias("resource"),
            F.col("span_id").cast("long").alias("span_id"),
            F.col("trace_id").cast("long").alias("trace_id"),
        )
    )
    per_trace = (
        df.select(F.col("trace_id").cast("long").alias("__tid"),
                  span.alias("__span"))
        .groupBy("__tid")
        .agg(
            F.concat(
                F.lit("["),
                F.array_join(F.sort_array(F.collect_list("__span")), ","),
                F.lit("]"),
            ).alias("__spans")
        )
    )
    return _body_batches(
        per_trace, F.col("__spans"), cfg, '{"traces":[', ",", "]}"
    )


def _h_datadog_metrics(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.datadog_metrics import (
        encode_datadog_series, series_body,
    )

    m = _metric_struct(df, cfg)
    obj = encode_datadog_series(
        m["name"], m["kind"], m["metric_type"], m["value"], m["ts"],
        m["tags"], namespace=m["namespace"],
    )
    return _body_batches(df, obj, cfg, '{"series":[', ",", "]}")


def _h_elasticsearch(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.elasticsearch import (
        bulk_action_line, datestamped_index, encode_bulk,
    )

    idx = datestamped_index(cfg.get("index", "vector"), _ts(df, cfg))
    action = bulk_action_line(cfg.get("action", "index"), idx)
    pair = encode_bulk(action, _event_json(df, cfg))
    return _ndjson_batches(df, pair, cfg)


def _h_loki(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.loki import loki_streams

    work = df.select(
        (
            F.col(cfg["labels_field"])
            if cfg.get("labels_field") in df.columns
            else F.create_map(
                *[
                    c
                    for k, v in (cfg.get("labels") or {"agent": "vector"}).items()
                    for c in (F.lit(k), F.lit(v))
                ]
            )
        ).alias("labels"),
        _codec_value(df, cfg).alias("line"),
        (F.unix_millis(_ts(df, cfg)) * 1_000_000).alias("ts_ns"),
    )
    streams = loki_streams(work)
    return streams.select(
        F.concat(
            F.lit('{"streams":['), F.col("stream_json"), F.lit("]}")
        ).alias("value")
    )


def _h_splunk_hec_logs(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.splunk import encode_hec_event

    obj = encode_hec_event(
        _event_json(df, cfg),
        event_is_json=True,
        ts_ms=F.unix_millis(_ts(df, cfg)),
        host=F.col("host").cast("string") if "host" in df.columns else None,
        index=F.lit(cfg["index"]) if cfg.get("index") else None,
        source=F.lit(cfg.get("source", "vector_spark")),
        sourcetype=F.lit(cfg.get("sourcetype", "_json")),
    )
    return _ndjson_batches(df, obj, cfg)


def _h_splunk_hec_metrics(df: DataFrame, cfg: dict) -> DataFrame:
    """HEC metric events: {"time","event":"metric","fields":
    {"metric_name":…, "_value":…}} (src/sinks/splunk_hec/metrics/
    encoder.rs)."""
    m = _metric_struct(df, cfg)
    obj = F.concat(
        F.lit('{"time":'),
        (F.unix_millis(m["ts"]) / 1000.0).cast("decimal(17,3)")
        .cast("string"),
        F.lit(',"event":"metric","fields":{"metric_name":"'),
        F.when(m["namespace"] != "",
               F.concat(m["namespace"], F.lit("."), m["name"]))
        .otherwise(m["name"]),
        F.lit('","_value":'),
        m["value"].cast("string"),
        F.lit("}}"),
    )
    return _ndjson_batches(df, obj, cfg)


def _h_gcp_stackdriver_logs(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.stackdriver import (
        encode_stackdriver_entry, log_name, remap_severity,
    )

    entry = encode_stackdriver_entry(
        log_name(
            cfg.get("parent_kind", "project"),
            F.lit(cfg.get("project_id", "proj")),
            F.lit(cfg.get("log_id", "vector")),
        ),
        _event_json(df, cfg),
        remap_severity(
            F.col(cfg["severity_field"]).cast("string")
            if cfg.get("severity_field") in df.columns
            else F.lit("DEFAULT")
        ),
        resource_type=F.lit(cfg.get("resource_type", "global")),
        resource_labels=F.create_map().cast("map<string,string>"),
        ts=_ts(df, cfg),
    )
    return _body_batches(df, entry, cfg, '{"entries":[', ",", "]}")


def _h_gcp_stackdriver_metrics(df: DataFrame, cfg: dict) -> DataFrame:
    """Cloud Monitoring timeSeries body
    (src/sinks/gcp/stackdriver/metrics/sink.rs): one point per series
    entry, custom.googleapis.com metric type namespace."""
    m = _metric_struct(df, cfg)
    entry = F.to_json(
        F.struct(
            F.struct(
                F.concat(
                    F.lit("custom.googleapis.com/"), m["name"]
                ).alias("type"),
            ).alias("metric"),
            F.array(
                F.struct(
                    F.struct(
                        F.date_format(
                            m["ts"], "yyyy-MM-dd'T'HH:mm:ss'Z'"
                        ).alias("endTime"),
                    ).alias("interval"),
                    F.struct(
                        m["value"].alias("doubleValue"),
                    ).alias("value"),
                )
            ).alias("points"),
            F.struct(F.lit("global").alias("type")).alias("resource"),
        )
    )
    return _body_batches(df, entry, cfg, '{"timeSeries":[', ",", "]}")


def _h_gcp_chronicle(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.chronicle import chronicle_body, chronicle_entry

    entry = chronicle_entry(_msg(df, cfg), _ts(df, cfg))
    batched = (
        df.select(entry.alias("__e"))
        .groupBy(_batch_key(df, cfg, F.col("__e")).alias("__b"))
        .agg(F.sort_array(F.collect_list("__e")).alias("__entries"))
    )
    return batched.select(
        chronicle_body(
            F.lit(cfg.get("customer_id", "c1")),
            F.lit(cfg.get("log_type", "VECTOR")),
            F.col("__entries"),
        ).alias("value")
    )


def _h_gcp_pubsub(df: DataFrame, cfg: dict) -> DataFrame:
    """Pub/Sub publish body: messages with base64 data
    (src/sinks/gcp/pubsub.rs)."""
    msg = F.to_json(
        F.struct(_b64(_codec_value(df, cfg).cast("binary")).alias("data"))
    )
    return _body_batches(df, msg, cfg, '{"messages":[', ",", "]}")


def _json_lit(df: DataFrame, name: str) -> Column:
    """Scalar column → JSON value literal (string types quoted+escaped,
    numerics/bools verbatim) for encoders that take pre-encoded maps."""
    dtype = dict(df.dtypes).get(name, "string")
    c = F.col(name)
    if dtype in ("string", "date", "timestamp", "timestamp_ntz"):
        esc = F.regexp_replace(
            F.regexp_replace(c.cast("string"), r"\\", r"\\\\"),
            '"', r'\\"',
        )
        return F.concat(F.lit('"'), esc, F.lit('"'))
    if dtype == "boolean":
        return F.when(c, F.lit("true")).otherwise(F.lit("false"))
    return c.cast("string")


def _h_azure_monitor(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.azure import azure_body, encode_azure_monitor_log

    cols = sorted(cfg.get("fields") or df.columns)
    fields = F.create_map(
        *[
            c
            for name in cols
            for c in (F.lit(name), _json_lit(df, name))
        ]
    )
    obj = encode_azure_monitor_log(fields, _ts(df, cfg))
    batched = (
        df.select(obj.alias("__o"))
        .groupBy(_batch_key(df, cfg, F.col("__o")).alias("__b"))
        .agg(azure_body(F.sort_array(F.collect_list("__o"))).alias("value"))
    )
    return batched.select("value")


def _h_honeycomb(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.honeycomb import (
        encode_honeycomb_event, honeycomb_body,
    )

    obj = encode_honeycomb_event(_ts(df, cfg), _event_json(df, cfg))
    batched = (
        df.select(obj.alias("__o"))
        .groupBy(_batch_key(df, cfg, F.col("__o")).alias("__b"))
        .agg(honeycomb_body(F.sort_array(F.collect_list("__o")))
             .alias("value"))
    )
    return batched.select("value")


def _h_new_relic(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks import new_relic as nr

    api = cfg.get("api", "logs")
    if api == "metrics":
        m = _metric_struct(df, cfg)
        obj = nr.encode_new_relic_metric(
            m["name"], m["kind"], m["metric_type"], m["value"],
            F.unix_millis(m["ts"]),
        )
        body = nr.metrics_body
    else:
        obj = nr.encode_new_relic_log(
            _msg(df, cfg), F.unix_millis(_ts(df, cfg))
        )
        body = nr.logs_body
    batched = (
        df.select(obj.alias("__o"))
        .groupBy(_batch_key(df, cfg, F.col("__o")).alias("__b"))
        .agg(body(F.sort_array(F.collect_list("__o"))).alias("value"))
    )
    return batched.select("value")


def _h_aws_cloudwatch_logs(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.cloudwatch import put_log_events_body

    framed = df.select(
        F.lit(cfg.get("group_name", "vector")).alias("log_group"),
        (
            F.col(cfg["stream_field"]).cast("string")
            if cfg.get("stream_field") in df.columns
            else F.lit(cfg.get("stream_name", "default"))
        ).alias("log_stream"),
        F.unix_millis(_ts(df, cfg)).alias("ts_ms"),
        _msg(df, cfg).alias("message"),
    )
    return put_log_events_body(framed).select(
        F.col("body").alias("value")
    )


def _h_aws_cloudwatch_metrics(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.cloudwatch import (
        metric_datum, put_metric_data_body,
    )

    m = _metric_struct(df, cfg)
    datum = metric_datum(
        m["name"], m["value"], None, None, F.unix_millis(m["ts"]), m["tags"]
    )
    batched = (
        df.select(m["namespace"].alias("__ns"), datum.alias("__d"))
        .groupBy("__ns", _batch_key(df, cfg, F.col("__d")).alias("__b"))
        .agg(F.sort_array(F.collect_list("__d")).alias("__data"))
    )
    return batched.select(
        put_metric_data_body(F.col("__ns"), F.col("__data")).alias("value")
    )


def _h_kinesis(records_only: bool) -> Callable:
    def h(df: DataFrame, cfg: dict) -> DataFrame:
        """Kinesis PutRecords / Firehose PutRecordBatch bodies
        (src/sinks/aws_kinesis/{streams,firehose}/record.rs): Data is
        base64 of the encoded event; streams adds PartitionKey."""
        data = _b64(_codec_value(df, cfg).cast("binary"))
        if records_only:
            rec = F.concat(F.lit('{"Data":"'), data, F.lit('"}'))
        else:
            pk_field = cfg.get("partition_key_field")
            pk = (
                F.col(pk_field).cast("string")
                if pk_field
                else F.md5(data)
            )
            rec = F.concat(
                F.lit('{"Data":"'), data,
                F.lit('","PartitionKey":"'), pk, F.lit('"}'),
            )
        name = (
            '{"DeliveryStreamName":"%s","Records":['
            % cfg.get("stream_name", "vector")
            if records_only
            else '{"StreamName":"%s","Records":['
            % cfg.get("stream_name", "vector")
        )
        return _body_batches(df, rec, cfg, name, ",", "]}")

    return h


def _h_sqs_sns(df: DataFrame, cfg: dict) -> DataFrame:
    """SQS SendMessage / SNS Publish: one message per event, body is
    the encoded event (src/sinks/aws_s_s/sink.rs)."""
    group = cfg.get("message_group_id")
    out = [_codec_value(df, cfg).alias("value")]
    if group:
        out.insert(0, F.lit(group).alias("__key"))
    return df.select(*out)


def _h_prometheus_exporter(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.prometheus import (
        exposition_bodies, prometheus_samples,
    )

    m = _metric_struct(df, cfg)
    samples = prometheus_samples(
        df.select(
            m["name"].alias("name"), m["namespace"].alias("namespace"),
            m["metric_type"].alias("metric_type"),
            m["value"].alias("value"), m["tags"].alias("tags"),
        ),
        namespace_col="namespace", tags_col="tags",
    )
    return exposition_bodies(samples).select(F.col("body").alias("value"))


def _h_prometheus_remote_write(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.prometheus_remote import remote_write_bodies

    m = _metric_struct(df, cfg)
    work = df.select(
        m["name"].alias("__name"), m["value"].alias("__v"),
        F.unix_millis(m["ts"]).alias("__ts_ms"),
    ).select(
        F.create_map(F.lit("__name__"), F.col("__name")).alias("labels"),
        F.col("__v").alias("value"), F.col("__ts_ms").alias("ts_ms"),
        F.pmod(F.xxhash64("__name"), F.lit(16)).alias("batch"),
    )
    return remote_write_bodies(work).select(
        _b64(F.col("body")).alias("value")
    )


def _h_statsd(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.functions.parse import encode_statsd

    m = _metric_struct(df, cfg)
    line = encode_statsd(
        F.when(m["namespace"] != "",
               F.concat(m["namespace"], F.lit("."), m["name"]))
        .otherwise(m["name"]),
        m["metric_type"], m["kind"], m["value"],
        F.lit(None).cast("string"), F.lit(None).cast("double"),
        F.lit(None).cast("string"), m["tags"],
    )
    return df.select(line.alias("value"))


def _h_influx_metrics(df: DataFrame, cfg: dict) -> DataFrame:
    return df.select(_influx_line(df, cfg).alias("value"))


def _h_influxdb_logs(df: DataFrame, cfg: dict) -> DataFrame:
    """influxdb_logs (src/sinks/influxdb/logs/sink.rs): log events as
    line protocol, measurement = [namespace.]vector, message a field."""
    from vector_spark.functions.parse import encode_influxdb, ilp_field_str

    ns = cfg.get("namespace", "")
    measurement = F.lit(f"{ns}.vector" if ns else "vector")
    return df.select(
        encode_influxdb(
            measurement,
            [("metric_type", F.lit("logs"))],
            [("message", ilp_field_str(_msg(df, cfg)))],
            F.unix_millis(_ts(df, cfg)) * F.lit(1_000_000),
        ).alias("value")
    )


def _h_mezmo(df: DataFrame, cfg: dict) -> DataFrame:
    """mezmo/logdna ingest body: {"lines":[{"line","timestamp","app"}]}
    (src/sinks/mezmo.rs)."""
    obj = F.to_json(
        F.struct(
            F.lit(cfg.get("default_app", "vector")).alias("app"),
            _msg(df, cfg).alias("line"),
            F.unix_millis(_ts(df, cfg)).alias("timestamp"),
        )
    )
    return _body_batches(df, obj, cfg, '{"lines":[', ",", "]}")


def _h_appsignal(df: DataFrame, cfg: dict) -> DataFrame:
    """appsignal.com log ingest: JSON array of event objects with a
    group attribute (src/sinks/appsignal/mod.rs)."""
    obj = F.to_json(
        F.struct(
            F.lit(cfg.get("group", "app")).alias("group"),
            _msg(df, cfg).alias("message"),
            F.date_format(_ts(df, cfg), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("timestamp"),
        )
    )
    return _body_batches(df, obj, cfg, "[", ",", "]")


def _h_ndjson_generic(df: DataFrame, cfg: dict) -> DataFrame:
    """ndjson body family: axiom (ndjson ingest), clickhouse
    (JSONEachRow INSERT body), databend (NDJSON stage upload) — the
    encoded rows ARE the body; engine-side framing only."""
    return _ndjson_batches(df, _event_json(df, cfg), cfg)


def _h_greptimedb_logs(df: DataFrame, cfg: dict) -> DataFrame:
    """greptimedb_logs HTTP ingest: JSON array of row objects
    (src/sinks/greptimedb/logs/http_request_builder.rs)."""
    return _body_batches(df, _event_json(df, cfg), cfg, "[", ",", "]")


def _h_humio_logs(df: DataFrame, cfg: dict) -> DataFrame:
    """humio is HEC-compatible (src/sinks/humio/logs.rs wraps the
    splunk_hec sink with Humio's endpoint) — same ndjson HEC events."""
    return _h_splunk_hec_logs(df, cfg)


def _h_humio_metrics(df: DataFrame, cfg: dict) -> DataFrame:
    return _h_splunk_hec_metrics(df, cfg)


def _h_sematext_logs(df: DataFrame, cfg: dict) -> DataFrame:
    """sematext_logs is Elasticsearch-compatible bulk
    (src/sinks/sematext/logs.rs wraps the ES sink)."""
    return _h_elasticsearch(df, cfg)


def _h_papertrail(df: DataFrame, cfg: dict) -> DataFrame:
    cfg = {**cfg, "encoding": {"codec": "syslog"},
           "process": cfg.get("process", "vector")}
    return _h_framed(df, cfg)


def _h_otlp(df: DataFrame, cfg: dict) -> DataFrame:
    from vector_spark.sinks.otlp import log_record_json, resource_logs

    rec = log_record_json(
        _msg(df, cfg), F.unix_millis(_ts(df, cfg)) * F.lit(1_000_000)
    )
    res = F.create_map(
        F.lit("service.name"), F.lit(cfg.get("service_name", "vector"))
    )
    rl = resource_logs(
        df, res, rec, F.unix_millis(_ts(df, cfg)) * F.lit(1_000_000)
    )
    return rl.select(
        F.concat(
            F.lit('{"resourceLogs":['), F.col("resource_json"), F.lit("]}")
        ).alias("value")
    )


def _h_vector(df: DataFrame, cfg: dict) -> DataFrame:
    """vector-to-vector sink: native protobuf EventArray frames
    (src/sinks/vector/sink.rs), base64 per frame so the unit stays a
    string column."""
    cfg = {**cfg, "encoding": {"codec": cfg.get("version_codec", "native")}}
    return _h_framed(df, cfg)


SINK_TYPES: dict[str, Callable[[DataFrame, dict], DataFrame]] = {
    # transports: one framed line per event
    "socket": _h_framed,
    "websocket": _h_framed,
    "papertrail": _h_papertrail,
    "kafka": _h_keyed_framed("vector"),
    "redis": _h_keyed_framed("vector"),
    "nats": _h_keyed_framed("vector"),
    "mqtt": _h_keyed_framed("vector"),
    "pulsar": _h_keyed_framed("vector"),
    "amqp": _h_keyed_framed("vector"),
    "aws_sqs": _h_sqs_sns,
    "aws_sns": _h_sqs_sns,
    "gcp_pubsub": _h_gcp_pubsub,
    # object stores: keyed text objects
    "aws_s3": _h_object_store,
    "gcp_cloud_storage": _h_object_store,
    "azure_blob": _h_object_store,
    "webhdfs": _h_object_store,
    # HTTP body sinks
    "http": _h_http,
    "datadog_logs": _h_datadog_logs,
    "datadog_events": _h_datadog_events,
    "datadog_traces": _h_datadog_traces,
    "datadog_metrics": _h_datadog_metrics,
    "elasticsearch": _h_elasticsearch,
    "loki": _h_loki,
    "splunk_hec_logs": _h_splunk_hec_logs,
    "splunk_hec_metrics": _h_splunk_hec_metrics,
    "gcp_stackdriver_logs": _h_gcp_stackdriver_logs,
    "gcp_stackdriver_metrics": _h_gcp_stackdriver_metrics,
    "gcp_chronicle_unstructured": _h_gcp_chronicle,
    "azure_monitor_logs": _h_azure_monitor,
    "honeycomb": _h_honeycomb,
    "new_relic": _h_new_relic,
    "aws_cloudwatch_logs": _h_aws_cloudwatch_logs,
    "aws_cloudwatch_metrics": _h_aws_cloudwatch_metrics,
    "aws_kinesis_streams": _h_kinesis(records_only=False),
    "aws_kinesis_firehose": _h_kinesis(records_only=True),
    "mezmo": _h_mezmo,
    "appsignal": _h_appsignal,
    "axiom": _h_ndjson_generic,
    "clickhouse": _h_ndjson_generic,
    "databend": _h_ndjson_generic,
    "greptimedb_logs": _h_greptimedb_logs,
    "humio_logs": _h_humio_logs,
    "humio_metrics": _h_humio_metrics,
    "sematext_logs": _h_sematext_logs,
    "sematext_metrics": _h_influx_metrics,
    "greptimedb_metrics": _h_influx_metrics,
    "influxdb_logs": _h_influxdb_logs,
    "influxdb_metrics": _h_influx_metrics,
    "opentelemetry": _h_otlp,
    "prometheus_exporter": _h_prometheus_exporter,
    "prometheus_remote_write": _h_prometheus_remote_write,
    "statsd": _h_statsd,
    "vector": _h_vector,
}


def encode_sink(df: DataFrame, cfg: dict) -> DataFrame:
    t = cfg["type"]
    try:
        h = SINK_TYPES[t]
    except KeyError:
        raise ValueError(f"unknown sink type {t!r}") from None
    return h(df, cfg)
