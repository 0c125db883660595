"""OTLP trace decode (sources/otlp.py::parse_otlp_traces) + span->trace
assembly (operators/traces.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vector_spark.operators.traces import trace_assembly
from vector_spark.sources.otlp import parse_otlp_traces


def _req():
    return {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name",
                         "value": {"stringValue": "api"}},
                    ]
                },
                "scopeSpans": [
                    {
                        "scope": {"name": "app", "version": "1.0"},
                        "spans": [
                            {
                                "traceId": "aa01", "spanId": "01",
                                "name": "GET /x", "kind": 2,
                                "startTimeUnixNano": "1700000000000000000",
                                "endTimeUnixNano": "1700000000250000000",
                                "attributes": [
                                    {"key": "http.status",
                                     "value": {"intValue": "200"}},
                                ],
                                "status": {"code": 0},
                            },
                            {
                                "traceId": "aa01", "spanId": "02",
                                "parentSpanId": "01", "name": "db.query",
                                "kind": 3,
                                "startTimeUnixNano": "1700000000010000000",
                                "endTimeUnixNano": "0",
                                "droppedEventsCount": 3,
                                "status": {"code": 2, "message": "boom"},
                            },
                        ],
                    }
                ],
            }
        ]
    }


def test_parse_otlp_traces_flattens_and_types(spark):
    df = spark.createDataFrame([(json.dumps(_req()),)], "payload string")
    rows = {r.span_id: r for r in parse_otlp_traces(df).collect()}
    assert set(rows) == {"01", "02"}
    root = rows["01"]
    assert (root.trace_id, root.name, root.kind) == ("aa01", "GET /x", 2)
    assert root.parent_span_id is None
    assert str(root.start_ts) == "2023-11-14 22:13:20"
    assert str(root.end_ts) == "2023-11-14 22:13:20.250000"
    assert dict(root.attributes) == {"http.status": "200"}
    assert dict(root.resources) == {"service.name": "api"}
    assert (root.scope_name, root.scope_version) == ("app", "1.0")
    child = rows["02"]
    assert child.parent_span_id == "01"
    assert child.end_ts is None  # 0 nanos = absent (convert.rs:338-349)
    assert (child.status_code, child.status_message) == (2, "boom")
    assert child.dropped_events_count == 3


def test_trace_assembly_rollup(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def us(n):
        return t0 + datetime.timedelta(microseconds=n)

    rows = [
        # trace A: root + 2 children, one error, 300us wall
        ("A", "s1", None, us(0), us(300), "root-a", "api", 0),
        ("A", "s2", "s1", us(10), us(120), "child", "db", 2),
        ("A", "s3", "s1", us(50), us(200), "child2", "db", 0),
        # trace B: root arrives late in the stream, empty-string parent
        ("B", "t2", "t1", us(500), us(900), "child-b", "api", 0),
        ("B", "t1", "", us(400), us(1000), "root-b", "web", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, "
        "start_ts timestamp, end_ts timestamp, name string, "
        "service string, status_code int",
    )
    out = {r.trace_id: r for r in
           trace_assembly(df, service_col="service").collect()}
    a, b = out["A"], out["B"]
    assert (a.n_spans, a.n_errors, a.duration_us) == (3, 1, 300)
    assert a.root_name == "root-a"  # min_by ignores non-root spans
    assert a.n_services == 2
    assert (b.n_spans, b.root_name, b.duration_us) == (2, "root-b", 600)
