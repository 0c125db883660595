"""OTLP/JSON logs decode (sources/otlp.py) and encode (sinks/otlp.py) vs
the reference convert.rs semantics (lib/opentelemetry-proto/src/convert.rs)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from vector_spark.sinks import otlp as otlp_sink
from vector_spark.sources import otlp as otlp_src


def _parse(spark, payload, **kw):
    df = spark.createDataFrame([(payload,)], "payload string")
    return otlp_src.parse_otlp_logs(df, "payload", **kw).collect()


def _req(records, resource_attrs=None, scope=None):
    rl = {"scopeLogs": [{"logRecords": records}]}
    if resource_attrs is not None:
        rl["resource"] = {"attributes": resource_attrs}
    if scope is not None:
        rl["scopeLogs"][0]["scope"] = scope
    return json.dumps({"resourceLogs": [rl]})


def test_fan_out_and_field_mapping(spark):
    # two scopeLogs under one resource + a second resourceLogs entry
    payload = json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name",
                             "value": {"stringValue": "web"}}
                        ]
                    },
                    "scopeLogs": [
                        {
                            "scope": {"name": "lib1", "version": "2"},
                            "logRecords": [
                                {
                                    "timeUnixNano": "1704174378194000000",
                                    "severityNumber": 9,
                                    "severityText": "INFO",
                                    "body": {"stringValue": "hello"},
                                    "attributes": [
                                        {"key": "k",
                                         "value": {"intValue": "7"}}
                                    ],
                                    "traceId": "ab12",
                                    "spanId": "cd34",
                                    "flags": 1,
                                }
                            ],
                        },
                        {"logRecords": [{"body": {"boolValue": True}}]},
                    ],
                },
                {"scopeLogs": [{"logRecords": [
                    {"body": {"doubleValue": 2.5}}]}]},
            ]
        }
    )
    rows = _parse(
        spark, payload,
        observed_default=F.lit("2026-01-01").cast("timestamp"),
    )
    assert len(rows) == 3
    r = next(x for x in rows if x.message == "hello")
    assert r.timestamp.microsecond == 194000
    assert (r.severity_text, r.severity_number) == ("INFO", 9)
    assert (r.trace_id, r.span_id, r.flags) == ("ab12", "cd34", 1)
    assert r.attributes == {"k": "7"}
    assert r.resources == {"service.name": "web"}
    assert (r.scope_name, r.scope_version) == ("lib1", "2")
    # bool body canonicalizes lowercase; absent scope stays null but the
    # parent resource still applies (convert.rs: resource per ResourceLogs)
    b = next(x for x in rows if x.message == "true")
    assert b.scope_name is None
    assert b.resources == {"service.name": "web"}
    # double body; absent optional fields → NULL, dropped count → 0
    d = next(x for x in rows if x.message == "2.5")
    assert d.severity_text is None and d.severity_number is None
    assert d.flags is None and d.trace_id is None
    assert d.dropped_attributes_count == 0
    # no timestamps at all → both fall back to the caller clock
    assert str(d.timestamp) == "2026-01-01 00:00:00"
    assert d.observed_timestamp == d.timestamp


def test_timestamp_fallback_and_null_attrs(spark):
    rows = _parse(
        spark,
        _req(
            [
                {
                    "observedTimeUnixNano": "1704174378194000000",
                    "body": {"stringValue": "m"},
                    "attributes": [
                        {"key": "keep", "value": {"stringValue": "v"}},
                        {"key": "dropme", "value": {}},
                    ],
                }
            ]
        ),
    )
    (r,) = rows
    # time_unix_nano missing → timestamp = observed (convert.rs:357-365)
    assert r.timestamp == r.observed_timestamp
    assert r.timestamp.microsecond == 194000
    # valueless kv entries are dropped (convert.rs filter_map)
    assert r.attributes == {"keep": "v"}


def test_encode_omits_absent_fields_and_groups(spark):
    df = spark.createDataFrame(
        [
            ("a", 200, "svc1", "INFO", None),
            ("b", 100, "svc1", None, "tt"),
            ("c", 50, "svc2", "WARN", None),
        ],
        "msg string, ns long, svc string, sev string, tid string",
    )
    rec = otlp_sink.log_record_json(
        F.col("msg"), F.col("ns"),
        severity_text=F.col("sev"), trace_id=F.col("tid"),
    )
    out = otlp_sink.resource_logs(
        df, F.create_map(F.lit("service.name"), F.col("svc")),
        rec, F.col("ns"),
    ).collect()
    by_key = {r.resource_key: r for r in out}
    assert set(by_key) == {"service.name,svc1", "service.name,svc2"}
    parsed = json.loads(by_key["service.name,svc1"].resource_json)
    recs = parsed["scopeLogs"][0]["logRecords"]
    # sorted by timeUnixNano; absent severityText/traceId keys omitted
    assert [r["timeUnixNano"] for r in recs] == ["100", "200"]
    assert "severityText" not in recs[0] and recs[0]["traceId"] == "tt"
    assert recs[1]["severityText"] == "INFO" and "traceId" not in recs[1]
    assert parsed["resource"]["attributes"] == [
        {"key": "service.name", "value": {"stringValue": "svc1"}}
    ]
    assert parsed["scopeLogs"][0]["scope"]["name"] == "vector-spark"


def test_roundtrip(spark):
    """encode → decode recovers the flat fields."""
    df = spark.createDataFrame(
        [("hello \"quoted\" \\ line", 1704174378194000000)],
        "msg string, ns long",
    )
    rec = otlp_sink.log_record_json(F.col("msg"), F.col("ns"))
    enc = otlp_sink.resource_logs(
        df, F.create_map(F.lit("env"), F.lit("prod")), rec, F.col("ns")
    ).select(
        F.concat(
            F.lit('{"resourceLogs":['), F.col("resource_json"), F.lit("]}")
        ).alias("payload")
    )
    (r,) = otlp_src.parse_otlp_logs(enc, "payload").collect()
    assert r.message == 'hello "quoted" \\ line'
    assert r.resources == {"env": "prod"}
    assert r.timestamp.microsecond == 194000
