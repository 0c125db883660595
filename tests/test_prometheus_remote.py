"""Prometheus remote_write encoder (sinks/prometheus_remote.py) vs the
public prompb wire schema."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from vector_spark.sinks import prometheus_remote as PR


def test_series_round_trip_and_label_sort():
    body = PR.encode_write_request([
        PR.encode_series(
            {"type": "x", "__name__": "evt_total", "aaa": "1"},
            [(2.5, 1700000000123), (3.0, 1700000001123)],
        ),
        PR.encode_series({"__name__": "g"}, [(-1.25, 5)]),
    ])
    out = PR.decode_write_request(body)
    assert len(out) == 2
    assert out[0]["labels"] == {
        "__name__": "evt_total", "aaa": "1", "type": "x"
    }
    assert out[0]["samples"] == [(2.5, 1700000000123), (3.0, 1700000001123)]
    assert out[1] == {"labels": {"__name__": "g"}, "samples": [(-1.25, 5)]}
    # wire order of label messages is sorted by name: __name__ < aaa < type
    first_series = body
    assert first_series.find(b"__name__") < first_series.find(b"aaa")
    assert first_series.find(b"aaa") < first_series.find(b"type")


def test_remote_write_bodies_spark(spark):
    rows = []
    for i in range(6):
        rows.append((i % 2, {"__name__": "m", "i": str(i)},
                     float(i), 1700000000000 + i))
    df = spark.createDataFrame(
        rows, "batch bigint, labels map<string,string>, value double,"
        " ts_ms bigint"
    )
    bodies = PR.remote_write_bodies(df)
    got = {r.batch: r for r in bodies.collect()}
    assert got[0].n_series == 3 and got[1].n_series == 3
    back = PR.parse_write_request(bodies).collect()
    decoded = sorted(
        (r.batch, json.loads(r.labels)["i"], r.value, r.ts_ms) for r in back
    )
    want = sorted((b, l["i"], v, t) for b, l, v, t in rows)
    assert decoded == want
