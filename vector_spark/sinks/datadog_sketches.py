"""datadog_metrics sink — SketchPayload protobuf bodies (distributions).

Parity: reference ``src/sinks/datadog/metrics/encoder.rs``
sketch_to_proto_message (:498-560) with the wire schema from the PUBLIC
``proto/vector/dd_metric.proto``:

* ``SketchPayload{ sketches = 1 (repeated Sketch) }``
* ``Sketch{ metric = 1, host = 2, tags = 4 (repeated string),
  dogsketches = 7 (repeated Dogsketch) }``
* ``Dogsketch{ ts = 1 (int64 epoch-seconds), cnt = 2, min/max/avg/sum =
  3-6 (double), k = 7 (repeated sint32, packed+zigzag), n = 8 (repeated
  uint32, packed) }`` — the (k, n) arrays are exactly the AgentDDSketch
  bins from ``functions/ddsketch.py``.

Like sinks/prometheus_remote.py: nesting rides the from-scratch proto
codec (repeated embedded messages = repeated bytes); per-batch byte
assembly happens in a grouped Arrow UDF AFTER the sketch aggregation —
the shuffle carries (group, key, count) sketch state, never samples.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from vector_spark.functions.proto import decode_message, encode_message

DOGSKETCH_DESC = {
    1: ("ts", "int64"), 2: ("cnt", "int64"), 3: ("min", "double"),
    4: ("max", "double"), 5: ("avg", "double"), 6: ("sum", "double"),
    7: ("k", "sint32", "repeated"), 8: ("n", "uint32", "repeated"),
}
SKETCH_DESC = {
    1: ("metric", "string"), 2: ("host", "string"),
    4: ("tags", "string", "repeated"),
    7: ("dogsketches", "bytes", "repeated"),
}
SKETCH_PAYLOAD_DESC = {1: ("sketches", "bytes", "repeated")}


def encode_sketch(metric: str, host: str, tags: list[str],
                  dogsketch: dict[str, Any]) -> bytes:
    return encode_message(SKETCH_DESC, {
        "metric": metric, "host": host, "tags": list(tags),
        "dogsketches": [encode_message(DOGSKETCH_DESC, dogsketch)],
    })


def encode_sketch_payload(sketches: list[bytes]) -> bytes:
    return encode_message(SKETCH_PAYLOAD_DESC, {"sketches": sketches})


def decode_sketch_payload(buf: bytes) -> list[dict[str, Any]]:
    payload = decode_message(SKETCH_PAYLOAD_DESC, bytes(buf))
    out = []
    for sb in payload.get("sketches") or []:
        sk = decode_message(SKETCH_DESC, sb)
        dogs = [decode_message(DOGSKETCH_DESC, db)
                for db in sk.get("dogsketches") or []]
        out.append({"metric": sk.get("metric"), "host": sk.get("host"),
                    "tags": sk.get("tags") or [], "dogsketches": dogs})
    return out


def sketch_payload_bodies(
    df: DataFrame,
    batch_col: str = "batch",
    metric_col: str = "metric",
    host_col: str = "host",
    tags_col: str = "tags",
    ts_col: str = "ts_s",
) -> DataFrame:
    """ddsketch_agg output rows (+ metric/host/tags/ts columns) → one
    SketchPayload per batch; sketches sort by (metric, host) for a
    deterministic distributed body."""
    out_schema = f"{batch_col} bigint, n_sketches int, body binary"

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        entries = []
        for _, row in pdf.iterrows():
            dog = {
                "ts": int(row[ts_col]), "cnt": int(row["count"]),
                "min": float(row["min"]), "max": float(row["max"]),
                "avg": float(row["avg"]), "sum": float(row["sum"]),
                "k": [int(x) for x in row["ks"]],
                "n": [int(x) for x in row["ns"]],
            }
            entries.append((str(row[metric_col]), str(row[host_col]),
                            [str(t) for t in row[tags_col]], dog))
        entries.sort(key=lambda e: (e[0], e[1]))
        sketches = [encode_sketch(m, h, t, d) for m, h, t, d in entries]
        return pd.DataFrame(
            {batch_col: [key[0]], "n_sketches": [len(sketches)],
             "body": [encode_sketch_payload(sketches)]}
        )

    return df.groupBy(batch_col).applyInPandas(build, out_schema)


def parse_sketch_payload(df: DataFrame, body_col: str = "body",
                         id_col: str = "batch") -> DataFrame:
    """Decode SketchPayload bodies → one row per dogsketch (verification
    inverse)."""
    schema = (f"{id_col} bigint, metric string, host string, tags string, "
              "ts_s bigint, cnt bigint, min double, max double, "
              "avg double, sum double, ks string, ns string")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, body in zip(pdf[id_col], pdf[body_col]):
                for sk in decode_sketch_payload(body):
                    for d in sk["dogsketches"]:
                        rows.append({
                            id_col: int(rid), "metric": sk["metric"],
                            "host": sk["host"],
                            "tags": ",".join(sk["tags"]),
                            "ts_s": d.get("ts"), "cnt": d.get("cnt"),
                            "min": d.get("min"), "max": d.get("max"),
                            "avg": d.get("avg"), "sum": d.get("sum"),
                            "ks": ",".join(str(x) for x in d.get("k") or []),
                            "ns": ",".join(str(x) for x in d.get("n") or []),
                        })
            cols = [id_col, "metric", "host", "tags", "ts_s", "cnt",
                    "min", "max", "avg", "sum", "ks", "ns"]
            out = pd.DataFrame(rows, columns=cols)
            out[id_col] = out[id_col].astype("int64")
            yield out

    return df.select(id_col, body_col).mapInPandas(gen, schema)
