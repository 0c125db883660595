"""Prometheus exposition encoder (sinks/prometheus.py) vs the reference
StringCollector semantics (src/sinks/prometheus/collector.rs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_spark.sinks import prometheus as prom

METRIC_SCHEMA = (
    "name string, namespace string, metric_type string, value double, "
    "tags map<string,string>, "
    "buckets array<struct<le:double,count:long>>, "
    "quantiles array<struct<quantile:double,value:double>>, "
    "count long, sum double"
)


def _samples(spark, rows, **kw):
    df = spark.createDataFrame(rows, METRIC_SCHEMA)
    return prom.prometheus_samples(
        df, buckets_col="buckets", quantiles_col="quantiles",
        count_col="count", sum_col="sum", **kw,
    )


def test_counter_gauge_lines_and_header(spark):
    rows = [
        ("requests_total", "app", "counter", 7.0, {"env": "prod"},
         None, None, None, None),
        ("temp", "", "gauge", 21.5, None, None, None, None, None),
    ]
    out = {r.fullname: r for r in _samples(spark, rows).collect()}
    c = out["app_requests_total"]
    assert c.help_line == "# HELP app_requests_total requests_total"
    assert c.type_line == "# TYPE app_requests_total counter"
    assert c.line == 'app_requests_total{env="prod"} 7'
    g = out["temp"]  # empty namespace → bare name; no tags → no braces
    assert g.line == "temp 21.5"
    assert g.type_line == "# TYPE temp gauge"


def test_label_escaping_and_sorting(spark):
    rows = [
        ("m", None, "gauge", 1.0,
         {"z": 'say "hi"', "a": "back\\slash"}, None, None, None, None),
    ]
    (r,) = _samples(spark, rows, namespace_col=None).collect()
    # format_tag escapes \ and "; encode_tags sorts parts
    assert r.line == 'm{a="back\\\\slash",z="say \\"hi\\""} 1'


def test_set_maps_to_gauge_type(spark):
    rows = [("uniq_users", None, "set", 42.0, None, None, None, None, None)]
    (r,) = _samples(spark, rows, namespace_col=None).collect()
    assert r.prom_type == "gauge"
    assert r.line == "uniq_users 42"


def test_histogram_cumulative_inf_skip(spark):
    # per-bucket (NON-cumulative) counts 3,2,5; one infinite-le bucket
    # that must be skipped (collector.rs:139); total count 11 (one sample
    # beyond the last finite bucket), sum 99.5
    rows = [
        ("lat", "api", "histogram", None, {"svc": "a"},
         [(0.5, 3), (1.0, 2), (float("inf"), 1), (5.0, 5)],
         None, 11, 99.5),
    ]
    out = _samples(spark, rows).orderBy("ord").collect()
    lines = [r.line for r in out]
    assert lines == [
        'api_lat_bucket{le="0.5",svc="a"} 3',
        'api_lat_bucket{le="1",svc="a"} 5',
        'api_lat_bucket{le="5",svc="a"} 10',
        'api_lat_bucket{le="+Inf",svc="a"} 11',
        'api_lat_sum{svc="a"} 99.5',
        'api_lat_count{svc="a"} 11',
    ]


def test_summary_quantiles(spark):
    rows = [
        ("rt", None, "summary", None, None, None,
         [(0.5, 1.2), (0.99, 4.0)], 100, 150.25),
    ]
    out = _samples(spark, rows, namespace_col=None).orderBy("ord").collect()
    assert [r.line for r in out] == [
        'rt{quantile="0.5"} 1.2',
        'rt{quantile="0.99"} 4',
        "rt_sum 150.25",
        "rt_count 100",
    ]


def test_timestamp_suffix(spark):
    df = spark.createDataFrame(
        [("m", "gauge", 2.0, 1700000000123)],
        "name string, metric_type string, value double, ts long",
    )
    (r,) = prom.prometheus_samples(
        df, namespace_col=None, tags_col=None, ts_ms_col="ts"
    ).collect()
    assert r.line == "m 2 1700000000123"


def test_exposition_family_order_and_blocks(spark):
    rows = [
        ("b_metric", None, "counter", 1.0, None, None, None, None, None),
        ("a_metric", None, "gauge", 2.0, {"k": "v"}, None, None, None, None),
        ("a_metric", None, "gauge", 3.0, {"k": "w"}, None, None, None, None),
    ]
    body = prom.exposition(_samples(spark, rows, namespace_col=None))
    assert body == (
        "# HELP a_metric a_metric\n# TYPE a_metric gauge\n"
        'a_metric{k="v"} 2\na_metric{k="w"} 3\n'
        "# HELP b_metric b_metric\n# TYPE b_metric counter\n"
        "b_metric 1\n"
    )
