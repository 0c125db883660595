"""Prometheus remote_write sink — protobuf WriteRequest bodies.

Parity: reference ``src/sinks/prometheus/remote_write/`` with the wire
schema from the PUBLIC ``lib/prometheus-parser/proto/prometheus-remote.
proto`` + ``prometheus-types.proto``:

* ``WriteRequest{ timeseries = 1 (repeated TimeSeries) }``
* ``TimeSeries{ labels = 1 (repeated Label), samples = 2 (repeated
  Sample) }``
* ``Label{ name = 1, value = 2 }`` — labels MUST sort by name (the
  remote-write spec; the reference sorts in collector.rs:342-348, with
  ``__name__`` carrying the metric name)
* ``Sample{ value = 1 (double), timestamp = 2 (int64 epoch-millis) }``

Nested messages ride the repo's from-scratch protobuf codec
(functions/proto.py): a repeated embedded message has the same wire form
as a repeated ``bytes`` field, so inner messages encode first and nest as
bytes. The HTTP body is snappy-compressed in the reference; python-snappy
is not in this image, so compression is gated exactly like
functions/compression.py (``compress="snappy"`` raises CodecUnavailable
unless the lib exists; the uncompressed protobuf is the default here and
is what the gate verifies byte-for-byte via round-trip).

Spark surface: per-batch assembly in an Arrow-batched grouped UDF — the
one place bytes must concatenate across rows; everything upstream
(labels, samples) stays columnar.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from vector_spark.functions.proto import decode_message, encode_message

LABEL_DESC = {1: ("name", "string"), 2: ("value", "string")}
SAMPLE_DESC = {1: ("value", "double"), 2: ("timestamp", "int64")}
TIMESERIES_DESC = {1: ("labels", "bytes", "repeated"),
                   2: ("samples", "bytes", "repeated")}
WRITE_REQUEST_DESC = {1: ("timeseries", "bytes", "repeated")}


def encode_series(labels: dict[str, str],
                  samples: list[tuple[float, int]]) -> bytes:
    """One TimeSeries: labels sorted by name, samples as given."""
    lbl = [
        encode_message(LABEL_DESC, {"name": k, "value": str(v)})
        for k, v in sorted(labels.items())
    ]
    smp = [
        encode_message(SAMPLE_DESC, {"value": float(v), "timestamp": int(t)})
        for v, t in samples
    ]
    return encode_message(TIMESERIES_DESC, {"labels": lbl, "samples": smp})


def encode_write_request(series: list[bytes]) -> bytes:
    return encode_message(WRITE_REQUEST_DESC, {"timeseries": series})


def decode_write_request(buf: bytes) -> list[dict[str, Any]]:
    """WriteRequest bytes → [{labels: {k: v}, samples: [(value, ts_ms)]}]."""
    req = decode_message(WRITE_REQUEST_DESC, bytes(buf))
    out = []
    for ts_bytes in req.get("timeseries") or []:
        ts = decode_message(TIMESERIES_DESC, ts_bytes)
        labels = {}
        for lb in ts.get("labels") or []:
            d = decode_message(LABEL_DESC, lb)
            labels[d.get("name")] = d.get("value")
        samples = []
        for sb in ts.get("samples") or []:
            d = decode_message(SAMPLE_DESC, sb)
            samples.append((d.get("value"), d.get("timestamp")))
        out.append({"labels": labels, "samples": samples})
    return out


def remote_write_bodies(
    df: DataFrame,
    batch_col: str = "batch",
    labels_col: str = "labels",
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
) -> DataFrame:
    """Rows (batch, labels map, value, ts_ms) → one WriteRequest per batch.

    Each input row becomes one single-sample TimeSeries (the reference
    sink's shape for a stream of metric events); series sort by their
    sorted-label key for a deterministic distributed body. One shuffle on
    the batch key."""
    out_schema = f"{batch_col} bigint, n_series int, body binary"

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        entries = []
        for labels, value, ts in zip(
            pdf[labels_col], pdf[value_col], pdf[ts_ms_col]
        ):
            lab = dict(labels)
            entries.append((tuple(sorted(lab.items())), lab,
                            float(value), int(ts)))
        entries.sort(key=lambda e: (e[0], e[3], e[2]))
        series = [
            encode_series(lab, [(v, t)]) for _, lab, v, t in entries
        ]
        return pd.DataFrame(
            {batch_col: [key[0]], "n_series": [len(series)],
             "body": [encode_write_request(series)]}
        )

    return df.groupBy(batch_col).applyInPandas(build, out_schema)


def parse_write_request(df: DataFrame, body_col: str = "body",
                        id_col: str = "batch") -> DataFrame:
    """Decode WriteRequest bodies → one row per sample (the inverse used
    by tests and the correctness gate)."""
    import json

    schema = (f"{id_col} bigint, labels string, value double, "
              "ts_ms bigint")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, labs, vals, tss = [], [], [], []
            for rid, body in zip(pdf[id_col], pdf[body_col]):
                for series in decode_write_request(body):
                    for v, t in series["samples"]:
                        ids.append(int(rid))
                        labs.append(json.dumps(
                            series["labels"], sort_keys=True,
                            separators=(",", ":")))
                        vals.append(v)
                        tss.append(t)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "labels": labs,
                 "value": pd.Series(vals, dtype="float64"),
                 "ts_ms": pd.Series(tss, dtype="int64")}
            )

    return df.select(id_col, body_col).mapInPandas(gen, schema)
