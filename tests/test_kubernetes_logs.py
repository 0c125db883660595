"""kubernetes_logs decode (sources/kubernetes.py) vs the reference CRI /
docker parsers and partial_events_merger semantics."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vector_spark.sources import kubernetes as k8s


def _cri_df(spark, rows):
    return spark.createDataFrame(
        rows, "file string, line_no long, value string"
    )


def test_parse_cri_fields_and_trailing_newline(spark):
    rows = k8s.parse_cri(
        _cri_df(spark, [
            ("f", 1, "2016-10-06T00:17:09.669794202Z stdout F log body"),
            ("f", 2, "2016-10-06T00:17:09.669794202Z stderr P partial \n"),
            ("f", 3, "not a cri line"),
        ])
    ).collect()
    assert len(rows) == 2  # non-matching line drops (ParserMatchError)
    fin = next(r for r in rows if not r.partial)
    assert (fin.stream, fin.message) == ("stdout", "log body")
    # nanosecond timestamp truncates to µs
    assert fin.timestamp.microsecond == 669794
    part = next(r for r in rows if r.partial)
    # single trailing newline trims; the space before it stays
    assert part.message == "partial "
    assert part.stream == "stderr"


def test_parse_docker_json_partial_heuristic(spark):
    big = "x" * k8s.DOCKER_SPLIT_THRESHOLD
    lines = [
        json.dumps({"log": "hello\n", "stream": "stdout",
                    "time": "2016-10-05T00:00:30.082640485Z"}),
        json.dumps({"log": big, "stream": "stdout",
                    "time": "2016-10-05T00:00:31.000000000Z"}),
        json.dumps({"log": big + "\n", "stream": "stdout",
                    "time": "2016-10-05T00:00:32.000000000Z"}),
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    rows = {r.timestamp_raw: r for r in k8s.parse_docker_json(df).collect()}
    r30 = rows["2016-10-05T00:00:30.082640485Z"]
    assert r30.message == "hello" and not r30.partial
    # exactly threshold bytes + no newline → partial
    assert rows["2016-10-05T00:00:31.000000000Z"].partial
    # threshold bytes WITH newline → final (docker.rs exception)
    assert not rows["2016-10-05T00:00:32.000000000Z"].partial


def test_merge_partial_runs(spark):
    ts = "2016-10-06T00:17:09.669794202Z"
    lines = [
        ("pod1", 1, f"{ts} stdout P First "),
        ("pod1", 2, f"{ts} stdout P line of "),
        ("pod1", 3, f"{ts} stdout F entry"),
        ("pod1", 4, f"{ts} stdout F whole"),
        # interleaved stderr stream merges independently
        ("pod1", 5, f"{ts} stderr F err-line"),
        # trailing unterminated partial run
        ("pod1", 6, f"{ts} stdout P dangling"),
        ("pod2", 1, f"{ts} stdout F other-pod"),
    ]
    parsed = k8s.parse_cri(_cri_df(spark, lines))
    out = k8s.merge_partial_lines(parsed).collect()
    msgs = {(r.file, r.stream, r.message): r for r in out}
    assert ("pod1", "stdout", "First line of entry") in msgs
    assert not msgs[("pod1", "stdout", "First line of entry")].partial
    assert ("pod1", "stdout", "whole") in msgs
    assert ("pod1", "stderr", "err-line") in msgs
    assert ("pod2", "stdout", "other-pod") in msgs
    dang = msgs[("pod1", "stdout", "dangling")]
    assert dang.partial  # flushed at end-of-input, flagged partial
    assert len(out) == 5
