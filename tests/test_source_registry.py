"""Topology source-type registry (plans/source_registry.py): every
reference source ``type`` executes through compile_config via
land-then-decode. Completeness is pinned against the reference's
src/sources listing; a sample of handlers runs end-to-end through
full topology configs."""

from __future__ import annotations

import base64
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vector_spark.plans import compile_config
from vector_spark.plans.source_registry import SOURCE_TYPES, build_source

_REF_SOURCES = Path("/root/reference/src/sources")

# rust module name → config `type =` string(s)
_MODULE_TYPES = {
    "aws_s_s": [],  # shared sink util, not a source
    "prometheus": ["prometheus_scrape", "prometheus_remote_write"],
    "file_descriptors": ["file_descriptor", "stdin"],
    "socket": ["socket"],
    "util": [],
    "mod": [],
}


def test_registry_covers_reference_source_modules():
    if not _REF_SOURCES.exists():
        pytest.skip("reference unavailable")
    missing = []
    for entry in sorted(_REF_SOURCES.iterdir()):
        mod = entry.name.removesuffix(".rs")
        types = _MODULE_TYPES.get(mod, [mod])
        for t in types:
            if t in ("static_metrics",):  # built into topology.py
                continue
            if t not in SOURCE_TYPES:
                missing.append(t)
    assert not missing, f"source types without a handler: {missing}"


def _topo_out(spark, source_cfg, transform=None):
    """Run a one-source topology end-to-end and return the sink input."""
    cfg = {
        "sources": {"in": source_cfg},
        "transforms": {},
        "sinks": {"out": {"type": "memory", "inputs": ["in"]}},
    }
    if transform:
        cfg["transforms"]["t"] = {**transform, "inputs": ["in"]}
        cfg["sinks"]["out"]["inputs"] = ["t"]
    topo = compile_config(spark, cfg)
    return topo.resolve(cfg["sinks"]["out"]["inputs"][0])


def test_demo_logs_source_through_topology(spark):
    out = _topo_out(
        spark,
        {"type": "demo_logs", "format": "apache_common", "count": 50},
        transform={
            "type": "remap",
            "source": '. = parse_common_log!(.message)',
        },
    )
    rows = out.collect()
    assert len(rows) == 50 and all(r.status is not None for r in rows)


def test_syslog_source(spark):
    df = build_source(
        spark,
        {
            "type": "syslog",
            "lines": [
                "<34>1 2024-01-01T00:00:00Z h app 1 - - hello",
                "<13>1 2024-01-01T00:00:01Z h app 2 - - world",
            ],
        },
    )
    rows = df.collect()
    assert [r.message for r in rows] == ["hello", "world"]
    assert rows[0].severity == 2  # 34 = facility 4, severity 2


def test_statsd_source(spark):
    df = build_source(
        spark,
        {"type": "statsd", "lines": ["pages:1|c", "fps:8.2|g", "bad"]},
    )
    rows = {r.name: r for r in df.collect()}
    assert set(rows) == {"pages", "fps"}  # malformed dropped
    assert rows["pages"].metric_type == "counter"


def test_transport_source_with_codec(spark):
    df = build_source(
        spark,
        {
            "type": "kafka",
            "lines": ['{"a": "1"}', '{"a": "2"}'],
            "decoding": {"codec": "json"},
        },
    )
    assert [r.decoded["a"] for r in df.collect()] == ["1", "2"]


def test_splunk_hec_source(spark):
    df = build_source(
        spark,
        {
            "type": "splunk_hec",
            "lines": [json.dumps({"event": "hello", "time": 1700000000})],
        },
    )
    assert df.collect()[0].message == "hello"


def test_prometheus_scrape_source(spark):
    body = 'up{job="a"} 1\nrequests_total{job="a"} 42\n'
    df = build_source(spark, {"type": "prometheus_scrape", "bodies": [body]})
    names = {r.name for r in df.collect()}
    assert names == {"up", "requests_total"}


def test_fluent_source(spark):
    from vector_spark.sources.fluent import encode_message

    payload = base64.b64encode(
        encode_message("app.log", 1700000000, {"msg": "hi"})
    ).decode()
    df = build_source(spark, {"type": "fluent", "payloads": [payload]})
    row = df.collect()[0]
    assert row.tag == "app.log" and json.loads(row.record)["msg"] == "hi"


def test_vector_native_source(spark):
    from vector_spark.functions.native_proto import event_to_native

    frame = base64.b64encode(
        event_to_native({"log": {"fields": {"message": "native hi"}}})
    ).decode()
    df = build_source(spark, {"type": "vector", "payloads": [frame]})
    assert "native hi" in df.collect()[0].event_json


def test_docker_logs_source(spark):
    rows = [
        ("c0", "stdout", 0, "2024-01-01T00:00:00.0Z part"),
        ("c0", "stdout", 1, "2024-01-01T00:00:01.0Z ial line\n"),
        ("c1", "stderr", 0, "2024-01-01T00:00:02.0Z whole\n"),
    ]
    df = build_source(spark, {"type": "docker_logs", "rows": rows})
    msgs = sorted(r.message for r in df.collect())
    assert msgs == ["partial line", "whole"]


def test_kubernetes_logs_source(spark):
    rows = [
        ("p.log", 0, "2024-01-01T00:00:00.0Z stdout P par"),
        ("p.log", 1, "2024-01-01T00:00:01.0Z stdout F tial"),
        ("p.log", 2, "2024-01-01T00:00:02.0Z stdout F whole"),
    ]
    df = build_source(spark, {"type": "kubernetes_logs", "rows": rows})
    msgs = sorted(r.message for r in df.collect())
    assert msgs == ["partial", "whole"]


def test_host_metrics_source(spark):
    stat = "cpu0 100 0 50 1000 0 0 0 0 0 0\ncpu 100 0 50 1000 0 0 0 0 0 0\n"
    df = build_source(
        spark, {"type": "host_metrics", "collectors": {"cpu": stat}}
    )
    assert df.count() > 0


def test_file_source_reads_lines(spark, tmp_path):
    p = tmp_path / "x.log"
    p.write_text("a\nb\n")
    df = build_source(spark, {"type": "file", "path": str(p)})
    assert sorted(r.value for r in df.collect()) == ["a", "b"]


def test_unknown_source_type_is_loud(spark):
    with pytest.raises(ValueError, match="unknown source type"):
        build_source(spark, {"type": "nope"})
