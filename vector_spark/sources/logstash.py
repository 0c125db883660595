"""logstash source — lumberjack/beats wire-protocol decoder.

Parity: reference ``src/sources/logstash.rs:309-700`` (the
logstash-input-beats PROTOCOL.md framing): a stream of frames, each
``<version byte '1'|'2'><type byte><payload>``:

* ``W`` window size: u32 BE (flow control — parsed and skipped);
* ``D`` data: u32 sequence number, u32 pair count, then
  ``u32 klen, key, u32 vlen, value`` pairs — all values strings
  (:556-590); zero pairs invalidates the frame (:562-564);
* ``J`` json: u32 sequence number, u32 payload size, JSON object
  (:613-647);
* ``C`` compressed: u32 payload size, zlib-deflated inner frame stream,
  decoded recursively (:649-700);
* ``A`` ack: server→client only; skipped if seen inbound.

TCP/TLS listening and the ack write-back are the cluster ingest tier's
job; this module rebuilds the byte-level decode as an Arrow-batched
``mapInPandas`` (one input row = one captured stream chunk containing
whole frames). Each event frame yields one output row ``(protocol,
sequence_number, fields)`` with fields rendered as canonical sorted-key
JSON — the BTreeMap shape the reference builds. The matching encoders
exist to synthesize deterministic test vectors.
"""

from __future__ import annotations

import json
import struct as _struct
import zlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# encoders (test-vector generators)
# ---------------------------------------------------------------------------

def encode_window(size: int, version: bytes = b"2") -> bytes:
    return version + b"W" + _struct.pack(">I", size)


def encode_data_frame(seq: int, fields: dict[str, str],
                      version: bytes = b"2") -> bytes:
    out = [version, b"D", _struct.pack(">II", seq, len(fields))]
    for k, v in fields.items():
        kb, vb = str(k).encode(), str(v).encode()
        out.append(_struct.pack(">I", len(kb)) + kb)
        out.append(_struct.pack(">I", len(vb)) + vb)
    return b"".join(out)


def encode_json_frame(seq: int, obj: dict[str, Any],
                      version: bytes = b"2") -> bytes:
    payload = json.dumps(obj, separators=(",", ":")).encode()
    return (version + b"J" + _struct.pack(">II", seq, len(payload))
            + payload)


def encode_compressed(inner: bytes, version: bytes = b"2") -> bytes:
    blob = zlib.compress(inner, 6)
    return version + b"C" + _struct.pack(">I", len(blob)) + blob


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _u32(buf: bytes, off: int) -> tuple[int, int]:
    if off + 4 > len(buf):
        raise ValueError("truncated lumberjack frame")
    return _struct.unpack(">I", buf[off:off + 4])[0], off + 4


def decode_lumberjack(buf: bytes) -> list[tuple[str, int, str]]:
    """Whole-frame stream → [(protocol, sequence_number, fields_json)]."""
    out: list[tuple[str, int, str]] = []
    off = 0
    buf = bytes(buf)
    while off < len(buf):
        version = chr(buf[off])
        if version not in ("1", "2"):
            raise ValueError(f"unknown lumberjack version {version!r}")
        ftype = chr(buf[off + 1])
        off += 2
        if ftype in ("W", "A"):
            _, off = _u32(buf, off)
        elif ftype == "D":
            seq, off = _u32(buf, off)
            pair_count, off = _u32(buf, off)
            if pair_count == 0:
                raise ValueError("data frame with zero pairs")
            fields: dict[str, Any] = {}
            for _ in range(pair_count):
                klen, off = _u32(buf, off)
                key = buf[off:off + klen].decode("utf-8", "replace")
                off += klen
                vlen, off = _u32(buf, off)
                fields[key] = buf[off:off + vlen].decode("utf-8", "replace")
                off += vlen
            out.append((version, seq, _canon(fields)))
        elif ftype == "J":
            seq, off = _u32(buf, off)
            size, off = _u32(buf, off)
            fields = json.loads(buf[off:off + size].decode("utf-8"))
            off += size
            out.append((version, seq, _canon(fields)))
        elif ftype == "C":
            size, off = _u32(buf, off)
            inner = zlib.decompress(buf[off:off + size])
            off += size
            out.extend(decode_lumberjack(inner))
        else:
            raise ValueError(f"unknown lumberjack frame type {ftype!r}")
    return out


def _canon(fields: dict) -> str:
    return json.dumps(fields, sort_keys=True, separators=(",", ":"))


def parse_logstash(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "event_id") -> DataFrame:
    """Decode a binary column of lumberjack frame streams.

    One input row = one stream chunk of whole frames; one output row per
    event frame: ``(id_col, protocol, sequence_number, fields)``.
    Undecodable chunks yield zero rows (the reference drops the
    connection on DecodeError)."""
    schema = (f"{id_col} bigint, protocol string, "
              "sequence_number bigint, fields string")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, protos, seqs, flds = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames = decode_lumberjack(payload)
                except (ValueError, zlib.error, json.JSONDecodeError,
                        UnicodeDecodeError):
                    continue
                for proto, seq, fields in frames:
                    ids.append(rid)
                    protos.append(proto)
                    seqs.append(seq)
                    flds.append(fields)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "protocol": protos,
                 "sequence_number": pd.Series(seqs, dtype="int64"),
                 "fields": flds}
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema)
