"""Prometheus scrape decode (sources/prometheus.py) vs the reference
src/sources/prometheus/parser.rs regroup semantics."""

from __future__ import annotations

import math

from vector_spark.sources.prometheus import parse_prometheus_text

TEXT = """# HELP http_requests_total notes
# TYPE http_requests_total counter
http_requests_total{code="200",path="/a\\"b\\\\c\\nd"} 100 1700000000000
http_requests_total{code="500"} 3
# TYPE temp gauge
temp 21.5
untyped_thing{x="1"} 7
bad_value_thing NaN
# TYPE lat histogram
lat_bucket{svc="w",le="1"} 8
lat_bucket{svc="w",le="0.1"} 5
lat_bucket{svc="w",le="+Inf"} 10
lat_sum{svc="w"} 12.5
lat_count{svc="w"} 10
lat_bucket{svc="x",le="0.1"} 1
lat_bucket{svc="x",le="+Inf"} 1
lat_sum{svc="x"} 0.05
lat_count{svc="x"} 1
# TYPE rt summary
rt{quantile="0.99"} 0.9
rt{quantile="0.5"} 0.2
rt_sum 4.2
rt_count 20
"""


def _parse(spark, text=TEXT):
    df = spark.createDataFrame(
        [(l,) for l in text.splitlines()], "value string"
    )
    return parse_prometheus_text(df).collect()


def test_simple_kinds_and_escapes(spark):
    rows = _parse(spark)
    by = {(r.name, str(sorted((r.tags or {}).items()))): r for r in rows}
    c200 = next(r for r in rows if (r.tags or {}).get("code") == "200")
    assert c200.kind == "counter" and c200.value == 100.0
    assert c200.timestamp_ms == 1700000000000
    # the three exposition escapes in label values
    assert c200.tags["path"] == '/a"b\\c\nd'
    c500 = next(r for r in rows if (r.tags or {}).get("code") == "500")
    assert c500.value == 3.0 and c500.timestamp_ms is None
    gauge = by[("temp", "[]")]
    assert gauge.kind == "gauge" and gauge.value == 21.5
    # no TYPE declaration → untyped
    unt = next(r for r in rows if r.name == "untyped_thing")
    assert unt.kind == "untyped" and unt.value == 7.0
    nanr = next(r for r in rows if r.name == "bad_value_thing")
    assert math.isnan(nanr.value)


def test_histogram_regroup_deaccumulate(spark):
    rows = _parse(spark)
    w = next(r for r in rows if r.name == "lat"
             and (r.tags or {}).get("svc") == "w")
    # unsorted input buckets sort by le, de-accumulate, +Inf drops
    assert [(b["le"], b["count"]) for b in w.buckets] == [(0.1, 5.0), (1.0, 3.0)]
    assert (w["count"], w["sum"]) == (10.0, 12.5)
    x = next(r for r in rows if r.name == "lat"
             and (r.tags or {}).get("svc") == "x")
    assert [(b["le"], b["count"]) for b in x.buckets] == [(0.1, 1.0)]
    assert (x["count"], x["sum"]) == (1.0, 0.05)


def test_summary_regroup(spark):
    rows = _parse(spark)
    rt = next(r for r in rows if r.name == "rt")
    assert rt.kind == "summary"
    # quantile VALUES stay raw (not cumulative), sorted by quantile
    assert [(q.quantile, q.value) for q in rt.quantiles] == [
        (0.5, 0.2), (0.99, 0.9)]
    assert (rt["count"], rt["sum"]) == (20.0, 4.2)


def test_roundtrip_with_encoder(spark):
    """The parsed histogram feeds sinks/prometheus.py back to the same
    exposition lines (modulo HELP)."""
    from pyspark.sql import functions as F

    from vector_spark.sinks.prometheus import prometheus_samples

    rows = _parse(spark)
    w = next(r for r in rows if r.name == "lat"
             and (r.tags or {}).get("svc") == "w")
    df = spark.createDataFrame(
        [(
            w.name, dict(w.tags),
            [(b["le"], int(b["count"])) for b in w.buckets],
            int(w["count"]), w["sum"],
        )],
        "name string, tags map<string,string>, "
        "buckets array<struct<le:double,count:long>>, "
        "count long, sum double",
    ).select(
        "name", "tags",
        F.lit("histogram").alias("metric_type"),
        F.lit(None).cast("double").alias("value"),
        "buckets", "count", "sum",
    )
    out = prometheus_samples(
        df, "name", namespace_col=None, tags_col="tags",
        buckets_col="buckets", count_col="count", sum_col="sum",
    )
    lines = {r.line for r in out.collect()}
    assert 'lat_bucket{le="0.1",svc="w"} 5' in lines
    assert 'lat_bucket{le="1",svc="w"} 8' in lines  # re-accumulated
    assert 'lat_bucket{le="+Inf",svc="w"} 10' in lines
    assert 'lat_sum{svc="w"} 12.5' in lines
    assert 'lat_count{svc="w"} 10' in lines
