"""Topology source-type registry — every reference source ``type``
compiles AND executes through ``compile_config``.

Cluster contract (the 10^12-row shape): Spark executors never terminate
TCP or poll daemons. Network/listener/poller sources follow
LAND-THEN-DECODE — a collector lands raw payloads on object storage and
Spark decodes them at scan parallelism with the SAME decoder modules the
per-source gate queries verify bit-exact. Each handler therefore maps the
reference source type to (payload reader × decoder module) with the
reference's config keys where they affect decode semantics.

Payload config keys (uniform across transport types):
  ``path``     — landed payload files (glob). Newline-framed text unless
                 the type is body- or frame-oriented (noted per handler).
  ``lines``    — inline payload lines (tests / small fixtures).
  ``bodies``   — inline whole request/scrape bodies.
  ``payloads`` — inline binary frames, base64-encoded.
  ``format``   — landed-file framing for body/frame types: ``wholetext``
                 (default: one body per file) or ``jsonl``.

Reference source modules: src/sources/*.rs (one citation per handler).
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["SOURCE_TYPES", "build_source"]


# --- payload readers ---------------------------------------------------------


def _line_df(spark: SparkSession, cfg: dict) -> DataFrame:
    """Newline-framed payloads → one row per line, column ``value``."""
    if "lines" in cfg:
        return spark.createDataFrame(
            [(ln,) for ln in cfg["lines"]], "value string"
        )
    path = cfg.get("path") or (cfg.get("include") or [None])[0]
    if path is None:
        raise ValueError("source needs `path`/`include` or inline `lines`")
    charset = (cfg.get("encoding") or {}).get("charset")
    if charset:
        from vector_spark.sources.readers import read_lines_charset

        return read_lines_charset(spark, path, charset).select("value")
    return spark.read.text(path)


def _body_df(spark: SparkSession, cfg: dict) -> DataFrame:
    """Request/scrape bodies → one row per body, column ``value``."""
    if "bodies" in cfg:
        return spark.createDataFrame(
            [(b,) for b in cfg["bodies"]], "value string"
        )
    if "lines" in cfg or cfg.get("format") == "jsonl":
        return _line_df(spark, cfg)
    path = cfg.get("path")
    if path is None:
        raise ValueError("source needs `path` or inline `bodies`")
    # one landed file = one request/scrape body (collector granularity)
    return spark.read.text(path, wholetext=True)


def _payload_df(spark: SparkSession, cfg: dict) -> DataFrame:
    """Binary frames → one row per frame, columns (event_id, payload)."""
    if "payloads" in cfg:
        rows = [
            (i, bytearray(base64.b64decode(p)))
            for i, p in enumerate(cfg["payloads"])
        ]
        return spark.createDataFrame(rows, "event_id long, payload binary")
    path = cfg.get("path")
    if path is None:
        raise ValueError("source needs `path` or inline base64 `payloads`")
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.xxhash64("path").alias("event_id"),
            F.col("content").alias("payload"),
        )
    )


def _decoded_lines(spark: SparkSession, cfg: dict) -> DataFrame:
    """Transport source: lines + optional ``decoding.codec`` (the
    reference's source-level codec, lib/codecs/src/decoding/mod.rs)."""
    from vector_spark.sources.readers import DECODERS

    df = _line_df(spark, cfg)
    codec = (cfg.get("decoding") or {}).get("codec", "bytes")
    if codec not in DECODERS:
        raise ValueError(
            f"decoding.codec {codec!r} not supported; have {sorted(DECODERS)}"
        )
    if codec == "bytes":
        return df
    return df.withColumn("decoded", DECODERS[codec](F.col("value")))


# --- per-type handlers --------------------------------------------------------


def _demo_logs(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/demo_logs/mod.rs — deterministic generator
    from vector_spark.sources.readers import (
        demo_apache_lines,
        demo_syslog_lines,
    )

    n = int(cfg.get("count", cfg.get("n", 1000)))
    fmt = cfg.get("format", "apache_common")
    if fmt == "apache_common":
        df = demo_apache_lines(spark, n)
    elif fmt in ("syslog", "bsd_syslog"):
        df = demo_syslog_lines(spark, n)
    else:
        raise ValueError(f"demo_logs format {fmt!r} not supported")
    # the reference emits the generated line as the event's `message`
    return df.withColumnRenamed("value", "message")


def _file(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/file.rs — framing + charset + multiline + codec
    ml = cfg.get("multiline")
    if ml:
        from vector_spark.sources.multiline import read_multiline

        path = cfg.get("path") or (cfg.get("include") or [None])[0]
        return read_multiline(
            spark,
            path,
            ml["start_pattern" if "start_pattern" in ml else "condition_pattern"],
            mode=ml.get("mode", "continue_through"),
        )
    return _decoded_lines(spark, cfg)


def _syslog(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/syslog.rs — RFC 5424 with 3164 fallback per line
    from vector_spark.functions import parse as P

    df = _line_df(spark, cfg)
    return df.select("value", P.parse_syslog(F.col("value")).alias("m")).select(
        "value", "m.*"
    )


def _statsd(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/statsd/parser.rs — one datagram per line
    from vector_spark.functions import parse as P

    df = _line_df(spark, cfg)
    m = P.parse_statsd(
        F.col("value"), sanitize_keys=cfg.get("sanitize_keys", True)
    )
    return df.select(m.alias("m")).filter(F.col("m").isNotNull()).select("m.*")


def _heroku(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/heroku_logs.rs — logplex drain lines
    from vector_spark.sources.heroku import parse_logplex

    return parse_logplex(_line_df(spark, cfg))


def _journald(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/journald.rs — export-format JSON lines + unit filters
    from vector_spark.sources.journald import parse_journald

    return parse_journald(
        _line_df(spark, cfg),
        include_units=cfg.get("include_units", ()),
        exclude_units=cfg.get("exclude_units", ()),
        include_matches=cfg.get("include_matches"),
        exclude_matches=cfg.get("exclude_matches"),
    )


def _datadog_agent(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/datadog_agent — one request body = JSON array of logs
    from vector_spark.sources.datadog import parse_agent_logs

    return parse_agent_logs(_body_df(spark, cfg))


def _splunk_hec(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/splunk_hec — HEC event JSON, one per line
    from vector_spark.sources.splunk import parse_hec_events

    return parse_hec_events(_line_df(spark, cfg))


def _firehose(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/aws_kinesis_firehose — one request body, many records
    from vector_spark.sources.firehose import parse_firehose_request

    return parse_firehose_request(
        _body_df(spark, cfg), compression=cfg.get("compression", "auto")
    )


def _aws_s3(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/aws_s3 — SQS S3-event notifications name the objects
    from vector_spark.sources.aws import parse_s3_event_notification

    return parse_s3_event_notification(_body_df(spark, cfg))


def _aws_sqs(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/aws_sqs — ReceiveMessage envelopes
    from vector_spark.sources.aws import parse_sqs_messages

    return parse_sqs_messages(_body_df(spark, cfg))


def _gcp_pubsub(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/gcp_pubsub — push envelopes
    from vector_spark.sources.aws import parse_pubsub_push

    return parse_pubsub_push(_body_df(spark, cfg))


def _otlp(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/opentelemetry — ExportLogsServiceRequest JSON bodies
    from vector_spark.sources.otlp import parse_otlp_logs

    return parse_otlp_logs(_body_df(spark, cfg), payload="value")


def _prometheus_scrape(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/prometheus/scrape.rs — exposition text
    from vector_spark.sources.prometheus import parse_prometheus_text

    body = _body_df(spark, cfg)
    lines = body.select(
        F.explode(F.split(F.col("value"), "\n")).alias("value")
    )
    return parse_prometheus_text(lines)


def _prometheus_remote_write(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/prometheus/remote_write.rs — prompb WriteRequest frames
    from vector_spark.sinks.prometheus_remote import parse_write_request

    return parse_write_request(
        _payload_df(spark, cfg).withColumnRenamed("payload", "body"),
        id_col="event_id",
    )


def _fluent(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/fluent — forward-protocol msgpack frames
    from vector_spark.sources.fluent import parse_fluent

    return parse_fluent(_payload_df(spark, cfg))


def _logstash(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/logstash.rs — lumberjack v1/v2 frame streams
    from vector_spark.sources.logstash import parse_logstash

    return parse_logstash(_payload_df(spark, cfg))


def _dnstap(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/dnstap — frame-streams payloads
    from vector_spark.sources.dnstap import parse_dnstap

    return parse_dnstap(_payload_df(spark, cfg))


def _vector(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/vector — native protobuf EventArray frames
    from vector_spark.functions.native_proto import parse_native_proto

    df = _payload_df(spark, cfg)
    return df.select(
        "event_id", parse_native_proto(F.col("payload")).alias("event_json")
    )


def _docker_logs(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/docker_logs — landed shape: JSON lines with
    # (container_id, stream, line_no, message) — the Docker API wire line
    # in `message` (timestamps: true)
    from vector_spark.sources import docker

    df = (
        spark.read.json(cfg["path"])
        if "path" in cfg
        else spark.createDataFrame(
            cfg["rows"],
            "container_id string, stream string, line_no long, message string",
        )
    )
    out = docker.parse_docker_log_output(df)
    return docker.merge_partial_events(
        out,
        auto_partial_merge=cfg.get("auto_partial_merge", True),
        partial_event_marker_field=cfg.get(
            "partial_event_marker_field", "_partial"
        ),
    )


def _kubernetes_logs(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/kubernetes_logs — landed shape: JSON lines with
    # (file, line_no, value) where `value` is the CRI / docker-json line
    from vector_spark.sources import kubernetes as k8s

    df = (
        spark.read.json(cfg["path"])
        if "path" in cfg
        else spark.createDataFrame(
            cfg["rows"], "file string, line_no long, value string"
        )
    )
    parsed = (
        k8s.parse_docker_json(df)
        if cfg.get("log_format") == "docker_json"
        else k8s.parse_cri(df)
    )
    return k8s.merge_partial_lines(parsed)


def _exec(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/exec — scheduled command output
    from vector_spark.sources.exec import read_exec

    return read_exec(
        spark,
        cfg["command"],
        decoder=(cfg.get("decoding") or {}).get("codec", "bytes"),
        include_stderr=cfg.get("include_stderr", True),
    )


def _status_body(parser):
    def handler(spark: SparkSession, cfg: dict) -> DataFrame:
        df = _body_df(spark, cfg).withColumnRenamed("value", "body")
        return parser(df)

    return handler


def _apache_metrics(spark, cfg):
    # src/sources/apache_metrics — mod_status ?auto bodies
    from vector_spark.sources.server_status import parse_apache_status

    return _status_body(parse_apache_status)(spark, cfg)


def _nginx_metrics(spark, cfg):
    # src/sources/nginx_metrics — stub_status bodies
    from vector_spark.sources.server_status import parse_nginx_stub_status

    return _status_body(parse_nginx_stub_status)(spark, cfg)


def _mongodb_metrics(spark, cfg):
    # src/sources/mongodb_metrics — serverStatus JSON bodies
    from vector_spark.sources.mongodb_metrics import parse_server_status

    return _status_body(parse_server_status)(spark, cfg)


def _eventstoredb_metrics(spark, cfg):
    # src/sources/eventstoredb_metrics — stats JSON bodies
    from vector_spark.sources.eventstoredb import parse_esdb_stats

    return _status_body(parse_esdb_stats)(spark, cfg)


def _ecs_metrics(spark, cfg):
    # src/sources/aws_ecs_metrics — task-metadata stats JSON bodies
    from vector_spark.sources.ecs_metrics import parse_ecs_stats

    return _status_body(parse_ecs_stats)(spark, cfg)


def _postgresql_metrics(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/postgresql_metrics — landed pg_stat view rows (JSONL /
    # parquet dump stands in for the live poll; JDBC at deploy time)
    from vector_spark.sources.postgresql_metrics import (
        pg_stat_database_metrics,
    )

    path = cfg["path"]
    df = (
        spark.read.parquet(path)
        if path.endswith(".parquet")
        else spark.read.json(path)
    )
    return pg_stat_database_metrics(df)


def _host_metrics(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/host_metrics — landed /proc snapshot bodies, one body
    # per (collector) via cfg["collectors"]: {name: path-or-inline-body}
    from vector_spark.sources import host_metrics as hm

    parsers = {
        "cpu": hm.parse_proc_stat,
        "memory": hm.parse_meminfo,
        "load": hm.parse_loadavg,
        "network": hm.parse_net_dev,
        "disk": hm.parse_diskstats,
    }
    outs = []
    for name, src in cfg.get("collectors", {}).items():
        if name not in parsers:
            raise ValueError(f"host_metrics collector {name!r} not supported")
        body = (
            spark.read.text(src, wholetext=True)
            if isinstance(src, str) and "\n" not in src
            else spark.createDataFrame([(src,)], "value string")
        )
        outs.append(parsers[name](body.withColumnRenamed("value", "body")))
    if not outs:
        raise ValueError("host_metrics needs `collectors`")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


def _internal_metrics(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/internal_metrics — the running pipeline's counters. In
    # a batch DAG the counters are a post-run artifact: read a
    # CheckpointedJob manifest directory (cfg["manifest"]) — the same
    # rows manifest.internal_metrics() exposes — or, for a live topology,
    # use compile_config(..., observe=True) + Topology.top().
    from vector_spark.sinks.manifest import CheckpointedJob

    if "out_dir" not in cfg:
        raise ValueError(
            "internal_metrics needs `out_dir` (a CheckpointedJob output "
            "dir); live-topology counters come from Topology.top()"
        )
    job = CheckpointedJob(
        spark,
        input_path=cfg.get("input_path", ""),
        out_dir=cfg["out_dir"],
        pipeline_fn=lambda _s, df: {},
        job_id=cfg.get("job_id", "job"),
    )
    return job.internal_metrics()


def _internal_logs(spark: SparkSession, cfg: dict) -> DataFrame:
    # src/sources/internal_logs — the engine's own log stream; batch
    # analog reads landed driver/executor logs as lines
    return _line_df(spark, cfg)


SOURCE_TYPES: dict[str, object] = {
    "demo_logs": _demo_logs,
    "file": _file,
    # stdin / file-descriptor / transport listeners: landed frames + codec
    "stdin": _decoded_lines,
    "file_descriptor": _decoded_lines,
    "socket": _decoded_lines,
    "http_server": _decoded_lines,
    "http_client": _decoded_lines,
    "http": _decoded_lines,
    # message buses: landed payload lines + codec (live brokers via the
    # streaming builders in vector_spark/streaming/kafka.py)
    "kafka": _decoded_lines,
    "amqp": _decoded_lines,
    "nats": _decoded_lines,
    "pulsar": _decoded_lines,
    "redis": _decoded_lines,
    "mqtt": _decoded_lines,
    "syslog": _syslog,
    "statsd": _statsd,
    "heroku_logs": _heroku,
    "journald": _journald,
    "datadog_agent": _datadog_agent,
    "splunk_hec": _splunk_hec,
    "aws_kinesis_firehose": _firehose,
    "aws_s3": _aws_s3,
    "aws_sqs": _aws_sqs,
    "gcp_pubsub": _gcp_pubsub,
    "opentelemetry": _otlp,
    "prometheus_scrape": _prometheus_scrape,
    "prometheus_remote_write": _prometheus_remote_write,
    "fluent": _fluent,
    "logstash": _logstash,
    "dnstap": _dnstap,
    "vector": _vector,
    "docker_logs": _docker_logs,
    "kubernetes_logs": _kubernetes_logs,
    "exec": _exec,
    "apache_metrics": _apache_metrics,
    "nginx_metrics": _nginx_metrics,
    "mongodb_metrics": _mongodb_metrics,
    "eventstoredb_metrics": _eventstoredb_metrics,
    "aws_ecs_metrics": _ecs_metrics,
    "postgresql_metrics": _postgresql_metrics,
    "host_metrics": _host_metrics,
    "internal_metrics": _internal_metrics,
    "internal_logs": _internal_logs,
}


def build_source(spark: SparkSession, cfg: dict) -> DataFrame:
    t = cfg["type"]
    if t not in SOURCE_TYPES:
        raise ValueError(f"unknown source type {t!r}")
    return SOURCE_TYPES[t](spark, cfg)
