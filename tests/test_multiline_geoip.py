"""Multiline line aggregation modes + geoip-style IP-range enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.enrich import enrich_ip_range
from vector_spark.sources.multiline import aggregate_lines


def _lines(spark, lines):
    return spark.createDataFrame(
        [("f1", i, l) for i, l in enumerate(lines)],
        "_source_file string, _line_no long, value string",
    )


STACKTRACE = [
    "2024-01-01 ERROR boom",
    "  at com.example.A(A.java:1)",
    "  at com.example.B(B.java:2)",
    "2024-01-01 INFO ok",
    "2024-01-01 ERROR again",
    "  at com.example.C(C.java:3)",
]


def test_continue_through_stacktraces(spark):
    # continuation lines are the indented ones
    out = aggregate_lines(
        _lines(spark, STACKTRACE), pattern=r"^\s+at ", mode="continue_through"
    ).orderBy("_line_no").collect()
    assert [r.n_lines for r in out] == [3, 1, 2]
    assert out[0].message.count("\n") == 2
    assert out[2].message.endswith("C.java:3)")


def test_halt_before_timestamps(spark):
    # every timestamped line starts a new event (inverse formulation)
    out = aggregate_lines(
        _lines(spark, STACKTRACE), pattern=r"^\d{4}-", mode="halt_before"
    ).orderBy("_line_no").collect()
    assert [r.n_lines for r in out] == [3, 1, 2]


def test_continue_past_backslash(spark):
    lines = ["cmd one \\", "continued \\", "end", "next"]
    out = aggregate_lines(
        _lines(spark, lines), pattern=r"\\$", mode="continue_past"
    ).orderBy("_line_no").collect()
    assert [r.n_lines for r in out] == [3, 1]
    assert out[0].message == "cmd one \\\ncontinued \\\nend"


def test_halt_with_terminator(spark):
    lines = ["a", "b", "END", "c", "END"]
    out = aggregate_lines(
        _lines(spark, lines), pattern=r"^END$", mode="halt_with"
    ).orderBy("_line_no").collect()
    assert [r.n_lines for r in out] == [3, 2]
    assert out[0].message == "a\nb\nEND"


def test_bad_mode(spark):
    with pytest.raises(ValueError, match="multiline mode"):
        aggregate_lines(_lines(spark, ["x"]), ".", mode="nope")


def test_enrich_ip_range(spark):
    df = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.1.5"), (3, "192.168.0.1")],
        "id long, ip string",
    )
    # ranges as uint32: 10.0.0.0/24 and 10.0.1.0/24
    dim = spark.createDataFrame(
        [
            (167772160, 167772416, "dc-east"),
            (167772416, 167772672, "dc-west"),
        ],
        "ip_lo long, ip_hi long, region string",
    )
    out = {r.id: r.region for r in enrich_ip_range(df, dim, "ip").collect()}
    assert out == {1: "dc-east", 2: "dc-west", 3: None}
