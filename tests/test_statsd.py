"""parse_statsd behavior parity vs the reference parser
(src/sources/statsd/parser.rs:30-199)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_spark.functions.parse import parse_statsd

CASES = [
    # (line, expected dict or None for malformed)
    ("foo:1|c", dict(name="foo", metric_type="counter", kind="incremental",
                     value=1.0, set_value=None, sample_rate=1.0,
                     statistic=None)),
    # counter scaled by 1/rate
    ("bar:2|c|@0.1", dict(name="bar", metric_type="counter",
                          kind="incremental", value=20.0, set_value=None,
                          sample_rate=0.1, statistic=None)),
    # ms → base seconds, histogram statistic
    ("baz:100|ms|@0.2", dict(name="baz", metric_type="distribution",
                             kind="incremental", value=0.1, set_value=None,
                             sample_rate=0.2, statistic="histogram")),
    ("qux:3|d", dict(name="qux", metric_type="distribution",
                     kind="incremental", value=3.0, set_value=None,
                     sample_rate=1.0, statistic="summary")),
    ("h1:7|h", dict(name="h1", metric_type="distribution",
                    kind="incremental", value=7.0, set_value=None,
                    sample_rate=1.0, statistic="histogram")),
    # gauges: bare value absolute, +/- incremental delta
    ("g1:1.5|g", dict(name="g1", metric_type="gauge", kind="absolute",
                      value=1.5, set_value=None, sample_rate=1.0,
                      statistic=None)),
    ("g2:-2.5|g", dict(name="g2", metric_type="gauge", kind="incremental",
                       value=-2.5, set_value=None, sample_rate=1.0,
                       statistic=None)),
    ("g3:+0.5|g", dict(name="g3", metric_type="gauge", kind="incremental",
                       value=0.5, set_value=None, sample_rate=1.0,
                       statistic=None)),
    ("s1:uniq|s", dict(name="s1", metric_type="set", kind="incremental",
                       value=None, set_value="uniq", sample_rate=1.0,
                       statistic=None)),
    # rate 0 sanitized to 1 (reference sanitize_sampling)
    ("z:4|c|@0", dict(name="z", metric_type="counter", kind="incremental",
                      value=4.0, set_value=None, sample_rate=1.0,
                      statistic=None)),
    # key sanitization: whitespace → _, '/' → "'-" then ' dropped → '-'
    ("sp ace/key:1|c", dict(name="sp_ace-key", metric_type="counter",
                            kind="incremental", value=1.0, set_value=None,
                            sample_rate=1.0, statistic=None)),
    # non-@ third / non-# tag component is ignored, not an error
    ("ok:1|c|junk", dict(name="ok", metric_type="counter",
                         kind="incremental", value=1.0, set_value=None,
                         sample_rate=1.0, statistic=None)),
    # malformed → null
    ("nocolon", None),
    ("x:1", None),            # body lacks '|type'
    ("x:1|y", None),          # unknown metric type
    ("x:abc|c", None),        # unparseable value
    ("x:.5|g", None),         # gauge must start with digit or +/-
    ("x:1|c|@-0.5", None),    # negative sample rate
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [(i, line) for i, (line, _) in enumerate(CASES)], ["i", "line"]
    )
    rows = (
        df.select("i", parse_statsd(F.col("line")).alias("m"))
        .orderBy("i")
        .collect()
    )
    return [r["m"] for r in rows]


def test_statsd_cases(parsed):
    for (line, exp), got in zip(CASES, parsed):
        if exp is None:
            assert got is None, f"{line!r} should be malformed, got {got}"
            continue
        assert got is not None, f"{line!r} should parse"
        for k, v in exp.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v), f"{line!r}.{k}"
            else:
                assert got[k] == v, f"{line!r}.{k}"


def test_statsd_tags(spark):
    df = spark.createDataFrame(
        [
            ("t1:1|c|#env:prod,bare",),
            ("t2:1|c|@0.5|#a:b,c:d",),
            ("t3:1|c",),
        ],
        ["line"],
    )
    rows = df.select(parse_statsd(F.col("line")).alias("m")).collect()
    t1, t2, t3 = (r["m"] for r in rows)
    assert t1["tags"] == {"env": "prod", "bare": None}
    assert t2["tags"] == {"a": "b", "c": "d"} and t2["value"] == 2.0
    assert t3["tags"] is None


def test_statsd_no_sanitize(spark):
    df = spark.createDataFrame([("sp ace/key:1|c",)], ["line"])
    r = df.select(
        parse_statsd(F.col("line"), sanitize_keys=False).alias("m")
    ).collect()[0]["m"]
    assert r["name"] == "sp ace/key"


ROUNDTRIP = [
    "foo:1|c",
    "bar:2.5|c",
    "g1:1.5|g",
    "g2:-2.5|g",
    "g3:+0.5|g",
    "baz:0.1|h|@0.2",
    "qux:3|d",
    "s1:uniq|s",
    "t1:2|c|#bare,env:prod",
    "t2:+4|g|#a:b",
]


def test_statsd_encode_roundtrip(spark):
    """encode(parse(line)) == line for canonical datagrams (sorted tags,
    no redundant rate/zero padding) — the statsd sink's wire format is the
    exact inverse of the source's parser for these."""
    from vector_spark.functions.parse import encode_statsd_struct

    df = spark.createDataFrame([(l,) for l in ROUNDTRIP], ["line"])
    out = df.select(
        "line",
        encode_statsd_struct(parse_statsd(F.col("line"))).alias("enc"),
    ).collect()
    for r in out:
        assert r["enc"] == r["line"], r


def test_statsd_encode_scaled_counter(spark):
    """A sampled counter re-encodes as its scaled value with no rate
    component (reference: scaling happens once at the source; the sink
    never re-emits @rate for counters)."""
    from vector_spark.functions.parse import encode_statsd_struct

    df = spark.createDataFrame([("c1:2|c|@0.5",)], ["line"])
    r = df.select(
        encode_statsd_struct(parse_statsd(F.col("line"))).alias("enc")
    ).collect()[0]
    assert r["enc"] == "c1:4|c"
