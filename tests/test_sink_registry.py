"""Topology sink-type registry (plans/sink_registry.py): every
reference sink ``type`` executes through compile_config via
encode-then-ship. Completeness is pinned against the reference's
website sink component listing; every handler runs end-to-end on a
standard frame; wire formats are spot-checked against the per-sink
encoder tests' expectations."""

from __future__ import annotations

import base64
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vector_spark.plans import compile_config
from vector_spark.plans.sink_registry import (
    BUILTIN_SINKS, SINK_TYPES, encode_sink,
)

_REF_SINK_CUES = Path("/root/reference/website/cue/reference/components/sinks")

# umbrella/category cue pages that are not a config `type`
_NOT_A_TYPE = {
    "aws_cloudwatch", "datadog", "gcp", "humio", "influxdb", "sematext",
    "splunk_hec",
}

_METRIC_TYPES = {
    "datadog_metrics", "aws_cloudwatch_metrics", "gcp_stackdriver_metrics",
    "splunk_hec_metrics", "humio_metrics", "sematext_metrics",
    "greptimedb_metrics", "influxdb_metrics", "prometheus_exporter",
    "prometheus_remote_write", "statsd",
}


def test_registry_covers_reference_sink_types():
    if not _REF_SINK_CUES.exists():
        pytest.skip("reference unavailable")
    missing = []
    for entry in sorted(_REF_SINK_CUES.glob("*.cue")):
        t = entry.name.removesuffix(".cue")
        if t.startswith("base") or t in _NOT_A_TYPE:
            continue
        if t not in SINK_TYPES and t not in BUILTIN_SINKS:
            missing.append(t)
    assert not missing, f"sink types without a handler: {missing}"


@pytest.fixture(scope="module")
def log_df(spark):
    return spark.createDataFrame(
        [
            ("m one", "2024-01-01 00:00:01", "h1", 1001, 1002, "res/a", 5),
            ("m two", "2024-01-01 00:00:02", "h2", 1001, 1003, "res/b", 7),
            ("m three", "2024-01-01 00:00:03", "h1", 2001, 2002, "res/c", 9),
        ],
        "message string, timestamp string, host string, trace_id long, "
        "span_id long, resource string, duration_ns long",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))


@pytest.fixture(scope="module")
def metric_df(spark):
    return spark.createDataFrame(
        [
            ("req_total", "app", "counter", "incremental",
             3.0, "2024-01-01 00:00:01"),
            ("mem_used", "", "gauge", "absolute",
             0.5, "2024-01-01 00:00:02"),
        ],
        "name string, namespace string, metric_type string, kind string, "
        "value double, event_ts string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))


def test_every_sink_type_encodes(spark, log_df, metric_df):
    """Smoke: each handler yields >=1 non-null string wire unit."""
    for t in sorted(SINK_TYPES):
        cfg = {"type": t}
        df = metric_df if t in _METRIC_TYPES else log_df
        if t == "new_relic":
            cfg["api"] = "logs"
        out = encode_sink(df, cfg)
        rows = out.collect()
        assert rows, f"{t}: no wire units"
        assert "value" in out.columns, f"{t}: no value column"
        assert all(
            r["value"] is not None and isinstance(r["value"], str)
            for r in rows
        ), f"{t}: null/non-string wire unit"


def test_statsd_and_influx_lines(spark, metric_df):
    lines = {
        r["value"]
        for r in encode_sink(metric_df, {"type": "statsd"}).collect()
    }
    assert "app.req_total:3|c" in lines
    ilp = sorted(
        r["value"]
        for r in encode_sink(metric_df, {"type": "influxdb_metrics"}).collect()
    )
    assert any(l.startswith("app.req_total value=3") for l in ilp)
    assert any(l.startswith("mem_used value=0.5") for l in ilp)


def test_kinesis_bodies_roundtrip(spark, log_df):
    body = encode_sink(
        log_df,
        {"type": "aws_kinesis_streams", "stream_name": "s1", "buckets": 1,
         "encoding": {"codec": "text"}},
    ).collect()[0]["value"]
    doc = json.loads(body)
    assert doc["StreamName"] == "s1" and len(doc["Records"]) == 3
    datas = sorted(
        base64.b64decode(r["Data"]).decode() for r in doc["Records"]
    )
    assert datas == ["m one", "m three", "m two"]
    assert all("PartitionKey" in r for r in doc["Records"])
    fh = encode_sink(
        log_df, {"type": "aws_kinesis_firehose", "buckets": 1}
    ).collect()[0]["value"]
    fdoc = json.loads(fh)
    assert "DeliveryStreamName" in fdoc and len(fdoc["Records"]) == 3
    assert "PartitionKey" not in fdoc["Records"][0]


def test_datadog_events_and_traces(spark, log_df):
    evs = encode_sink(log_df, {"type": "datadog_events"}).collect()
    docs = [json.loads(r["value"]) for r in evs]
    assert len(docs) == 3
    assert {d["text"] for d in docs} == {"m one", "m two", "m three"}
    assert all(isinstance(d["date_happened"], int) for d in docs)

    tr = encode_sink(
        log_df, {"type": "datadog_traces", "buckets": 1}
    ).collect()
    payload = json.loads(tr[0]["value"])
    spans = sorted(
        (s["trace_id"], s["span_id"])
        for t in payload["traces"]
        for s in json.loads(t) if isinstance(t, str)
    ) if payload["traces"] and isinstance(payload["traces"][0], str) else [
        (s["trace_id"], s["span_id"])
        for t in payload["traces"]
        for s in t
    ]
    assert sorted(spans) == [(1001, 1002), (1001, 1003), (2001, 2002)]


def test_hec_metrics_and_stackdriver_metrics(spark, metric_df):
    docs = [
        json.loads(line)
        for r in encode_sink(
            metric_df, {"type": "splunk_hec_metrics", "buckets": 1}
        ).collect()
        for line in r["value"].split("\n")
    ]
    names = {d["fields"]["metric_name"] for d in docs}
    assert names == {"app.req_total", "mem_used"}
    assert all(d["event"] == "metric" for d in docs)

    sd = encode_sink(
        metric_df, {"type": "gcp_stackdriver_metrics", "buckets": 1}
    ).collect()
    body = json.loads(sd[0]["value"])
    types = {t["metric"]["type"] for t in body["timeSeries"]}
    assert types == {
        "custom.googleapis.com/req_total", "custom.googleapis.com/mem_used"
    }


def test_object_store_key_template(spark, log_df):
    out = encode_sink(
        log_df,
        {"type": "aws_s3", "key_prefix": "date=%F/",
         "encoding": {"codec": "text"}},
    )
    rows = out.collect()
    assert {r["__key"] for r in rows} == {"date=2024-01-01/"}
    out2 = encode_sink(
        log_df,
        {"type": "gcp_cloud_storage", "key_prefix": "host={{ host }}/",
         "encoding": {"codec": "text"}},
    )
    assert {r["__key"] for r in out2.collect()} == {"host=h1/", "host=h2/"}


def test_vendor_sink_through_topology(spark, tmp_path):
    cfg = {
        "sources": {
            "in": {
                "type": "demo_logs",
                "format": "syslog",
                "count": 40,
            }
        },
        "transforms": {},
        "sinks": {
            "dd": {"type": "datadog_logs", "inputs": ["in"], "buckets": 4},
            "s3": {
                "type": "aws_s3",
                "inputs": ["in"],
                "encoding": {"codec": "json"},
                "key_prefix": "date=%F/",
                "path": str(tmp_path / "s3_land"),
            },
        },
    }
    topo = compile_config(spark, cfg)
    results = topo.write_sinks()
    assert results["dd"] >= 1  # body count (no path → memory-style)
    landed = spark.read.text(str(tmp_path / "s3_land"))
    assert landed.count() == 40


def test_loki_and_otlp_bodies(spark, log_df):
    loki = encode_sink(
        log_df, {"type": "loki", "labels": {"app": "t"},
                 "encoding": {"codec": "text"}}
    ).collect()
    doc = json.loads(loki[0]["value"])
    vals = doc["streams"][0]["values"]
    assert [v[1] for v in vals] == ["m one", "m two", "m three"]

    otlp = encode_sink(log_df, {"type": "opentelemetry"}).collect()
    body = json.loads(otlp[0]["value"])
    recs = body["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
    assert len(recs) == 3
