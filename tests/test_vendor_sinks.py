"""Datadog logs-intake encoder (sinks/datadog.py) and papertrail RFC 3164
encoder (functions/syslog.py) edge cases beyond the byte-exact gates."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from vector_spark.functions import parse as parsefn
from vector_spark.functions.syslog import encode_syslog_3164
from vector_spark.sinks import datadog as dd


def test_datadog_escaping_nulls_and_key_sort(spark):
    df = spark.createDataFrame(
        [('say "hi"\nnow', 123, None, {"zzz": "v", "aaa": "w"})],
        "msg string, ms long, host string, attrs map<string,string>",
    )
    (r,) = df.select(
        dd.encode_datadog_log(
            F.col("msg"), F.col("ms"),
            hostname=F.col("host"),  # NULL → omitted
            attributes=F.col("attrs"),
        ).alias("payload")
    ).collect()
    obj = json.loads(r.payload)
    assert obj == {"message": 'say "hi"\nnow', "timestamp": 123,
                   "aaa": "w", "zzz": "v"}
    assert "hostname" not in obj
    # BTreeMap order: sorted keys in the raw bytes
    keys = [k for k, _ in json.loads(
        r.payload, object_pairs_hook=lambda p: p)]
    assert keys == sorted(keys)


def test_normalize_ddtags(spark):
    df = spark.createDataFrame([(["a:1", "b:2"],)], "tags array<string>")
    (r,) = df.select(dd.normalize_ddtags(F.col("tags")).alias("t")).collect()
    assert r.t == "a:1,b:2"


def test_syslog_3164_day_padding_and_roundtrip(spark):
    df = spark.createDataFrame(
        [("2024-03-09 07:05:02", "web1", 42, "disk full"),
         ("2024-11-28 23:59:59", "db2", None, "ok")],
        "ts string, host string, pid int, msg string",
    )
    line = encode_syslog_3164(
        F.col("ts").cast("timestamp"), F.col("host"), F.lit("app"),
        F.col("msg"), pid=F.col("pid"),
    )
    rows = df.select(line.alias("line"),
                     parsefn.parse_bsd_syslog(line).alias("p")).collect()
    one = next(r for r in rows if "disk" in r.line)
    # single-digit day is space-padded; pri = 1*8+6
    assert one.line == "<14>Mar  9 07:05:02 web1 app[42]: disk full"
    assert (one.p.facility, one.p.severity) == (1, 6)
    assert one.p.procid == 42 and one.p.message == "disk full"
    two = next(r for r in rows if r.line.endswith("ok"))
    # no pid → no bracket suffix
    assert two.line == "<14>Nov 28 23:59:59 db2 app: ok"
    assert two.p.procid is None
