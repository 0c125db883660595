"""dnstap source — dnstap protobuf envelope + DNS wire-format parser.

Parity: reference ``src/sources/dnstap/`` + ``lib/dnsmsg-parser`` (the
reference parses dnstap frames from a unix socket; the socket listener is
the ingest tier's job, the decode is rebuilt here):

* the dnstap envelope is the PUBLIC dnstap.proto
  (``proto/third-party/dnstap.proto``): ``Dnstap{identity=1, version=2,
  message=14, type=15}`` wrapping ``Message{type=1, socket_family=2,
  socket_protocol=3, query_address=4, response_address=5, query_port=6,
  response_port=7, query_time_sec=8, query_time_nsec=9(fixed32),
  query_message=10, response_time_sec=12, response_time_nsec=13,
  response_message=14}`` — decoded with the repo's from-scratch protobuf
  codec (functions/proto.py);
* the embedded query/response is an RFC 1035 wire-format DNS message:
  12-byte header (id + QR/Opcode/AA/TC/RD/RA/RCODE bit fields + section
  counts), question section, and resource records with full
  compression-pointer name decoding (RFC 1035 §4.1.4); rdata decodes for
  A / AAAA / CNAME / NS / PTR / MX / TXT, anything else hex-encodes.

Spark surface: Arrow-batched ``mapInPandas`` (one input row = one dnstap
frame payload, e.g. unframed from a Frame Streams capture). Enum values
render with the proto's names (CLIENT_QUERY…, INET/INET6, UDP/TCP/DOT/
DOH); addresses render as IPs; answers render as canonical JSON.
"""

from __future__ import annotations

import ipaddress
import json
import struct as _struct
from datetime import datetime, timezone
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from vector_spark.functions.proto import decode_message, encode_message

DNSTAP_DESC = {
    1: ("identity", "bytes"),
    2: ("version", "bytes"),
    14: ("message", "bytes"),
    15: ("dnstap_type", "enum"),
}

MESSAGE_DESC = {
    1: ("type", "enum"),
    2: ("socket_family", "enum"),
    3: ("socket_protocol", "enum"),
    4: ("query_address", "bytes"),
    5: ("response_address", "bytes"),
    6: ("query_port", "uint32"),
    7: ("response_port", "uint32"),
    8: ("query_time_sec", "uint64"),
    9: ("query_time_nsec", "fixed32"),
    10: ("query_message", "bytes"),
    12: ("response_time_sec", "uint64"),
    13: ("response_time_nsec", "fixed32"),
    14: ("response_message", "bytes"),
}

MESSAGE_TYPES = {
    1: "AUTH_QUERY", 2: "AUTH_RESPONSE", 3: "RESOLVER_QUERY",
    4: "RESOLVER_RESPONSE", 5: "CLIENT_QUERY", 6: "CLIENT_RESPONSE",
    7: "FORWARDER_QUERY", 8: "FORWARDER_RESPONSE", 9: "STUB_QUERY",
    10: "STUB_RESPONSE", 11: "TOOL_QUERY", 12: "TOOL_RESPONSE",
    13: "UPDATE_QUERY", 14: "UPDATE_RESPONSE",
}
SOCKET_FAMILIES = {1: "INET", 2: "INET6"}
SOCKET_PROTOCOLS = {1: "UDP", 2: "TCP", 3: "DOT", 4: "DOH",
                    5: "DNSCryptUDP", 6: "DNSCryptTCP"}

QTYPES = {1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
          16: "TXT", 28: "AAAA", 33: "SRV", 255: "ANY"}
RCODES = {0: "NoError", 1: "FormErr", 2: "ServFail", 3: "NXDomain",
          4: "NotImp", 5: "Refused"}


# ---------------------------------------------------------------------------
# DNS wire codec
# ---------------------------------------------------------------------------

def encode_name(name: str) -> bytes:
    out = bytearray()
    for label in name.rstrip(".").split("."):
        if label:
            b = label.encode()
            out.append(len(b))
            out.extend(b)
    out.append(0)
    return bytes(out)


def encode_dns_response(
    dns_id: int,
    qname: str,
    qtype: int = 1,
    answers: list[tuple[int, int, bytes]] | None = None,
    rcode: int = 0,
    aa: bool = False,
) -> bytes:
    """Build a response with the answers' names as compression pointers to
    the question name (the classic 0xC00C layout)."""
    answers = answers or []
    flags = 0x8000 | (0x0400 if aa else 0) | 0x0100 | 0x0080 | rcode
    out = bytearray(_struct.pack(
        ">HHHHHH", dns_id, flags, 1, len(answers), 0, 0
    ))
    out.extend(encode_name(qname))
    out.extend(_struct.pack(">HH", qtype, 1))
    for rtype, ttl, rdata in answers:
        out.extend(b"\xc0\x0c")
        out.extend(_struct.pack(">HHIH", rtype, 1, ttl, len(rdata)))
        out.extend(rdata)
    return bytes(out)


def _read_name(buf: bytes, off: int) -> tuple[str, int]:
    """Decode a possibly-compressed name; returns (name, next offset)."""
    labels: list[str] = []
    jumps = 0
    end = -1
    while True:
        if off >= len(buf):
            raise ValueError("truncated name")
        n = buf[off]
        if n == 0:
            off += 1
            break
        if n & 0xC0 == 0xC0:  # compression pointer
            if end < 0:
                end = off + 2
            off = ((n & 0x3F) << 8) | buf[off + 1]
            jumps += 1
            if jumps > 64:
                raise ValueError("compression pointer loop")
            continue
        labels.append(buf[off + 1:off + 1 + n].decode("ascii", "replace"))
        off += 1 + n
    return ".".join(labels), (end if end >= 0 else off)


def _decode_rdata(buf: bytes, off: int, rtype: int, rdlen: int) -> str:
    data = buf[off:off + rdlen]
    if rtype == 1 and rdlen == 4:
        return str(ipaddress.IPv4Address(data))
    if rtype == 28 and rdlen == 16:
        return str(ipaddress.IPv6Address(data))
    if rtype in (2, 5, 12):  # NS / CNAME / PTR: a (possibly compressed) name
        return _read_name(buf, off)[0]
    if rtype == 15 and rdlen >= 3:  # MX: preference + exchange
        pref = _struct.unpack(">H", data[:2])[0]
        return f"{pref} {_read_name(buf, off + 2)[0]}"
    if rtype == 16:  # TXT: length-prefixed strings
        parts, p = [], 0
        while p < len(data):
            ln = data[p]
            parts.append(data[p + 1:p + 1 + ln].decode("utf-8", "replace"))
            p += 1 + ln
        return "".join(parts)
    return data.hex()


def parse_dns_message(buf: bytes) -> dict[str, Any]:
    """RFC 1035 wire message → header fields + questions + answers."""
    buf = bytes(buf)
    if len(buf) < 12:
        raise ValueError("truncated DNS header")
    dns_id, flags, qd, an, ns, ar = _struct.unpack(">HHHHHH", buf[:12])
    off = 12
    questions = []
    for _ in range(qd):
        name, off = _read_name(buf, off)
        qtype, qclass = _struct.unpack(">HH", buf[off:off + 4])
        off += 4
        questions.append((name, qtype, qclass))
    answers = []
    for _ in range(an):
        name, off = _read_name(buf, off)
        rtype, rclass, ttl, rdlen = _struct.unpack(
            ">HHIH", buf[off:off + 10]
        )
        off += 10
        answers.append(
            (name, rtype, rclass, ttl, _decode_rdata(buf, off, rtype, rdlen))
        )
        off += rdlen
    return {
        "id": dns_id,
        "qr": bool(flags & 0x8000),
        "opcode": (flags >> 11) & 0xF,
        "aa": bool(flags & 0x0400),
        "tc": bool(flags & 0x0200),
        "rd": bool(flags & 0x0100),
        "ra": bool(flags & 0x0080),
        "rcode": flags & 0xF,
        "qdcount": qd, "ancount": an, "nscount": ns, "arcount": ar,
        "questions": questions,
        "answers": answers,
    }


# ---------------------------------------------------------------------------
# dnstap envelope
# ---------------------------------------------------------------------------

def encode_dnstap_frame(
    message_type: int,
    dns_wire: bytes,
    query_address: bytes = b"",
    response_address: bytes = b"",
    query_port: int = 0,
    response_port: int = 0,
    time_sec: int = 0,
    time_nsec: int = 0,
    socket_family: int = 1,
    socket_protocol: int = 1,
    identity: bytes = b"ns1",
) -> bytes:
    is_response = message_type % 2 == 0
    msg: dict[str, Any] = {
        "type": message_type,
        "socket_family": socket_family,
        "socket_protocol": socket_protocol,
        "query_port": query_port,
        "response_port": response_port,
    }
    if query_address:
        msg["query_address"] = query_address
    if response_address:
        msg["response_address"] = response_address
    if is_response:
        msg["response_time_sec"] = time_sec
        msg["response_time_nsec"] = time_nsec
        msg["response_message"] = dns_wire
    else:
        msg["query_time_sec"] = time_sec
        msg["query_time_nsec"] = time_nsec
        msg["query_message"] = dns_wire
    return encode_message(DNSTAP_DESC, {
        "identity": identity,
        "version": b"vector-spark",
        "dnstap_type": 1,
        "message": encode_message(MESSAGE_DESC, msg),
    })


def _ip(b: bytes | None) -> str | None:
    if not b:
        return None
    if len(b) == 4:
        return str(ipaddress.IPv4Address(b))
    if len(b) == 16:
        return str(ipaddress.IPv6Address(b))
    return bytes(b).hex()


def parse_dnstap(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "event_id") -> DataFrame:
    """Decode a binary column of dnstap frames (envelope + DNS message).

    One output row per frame: message-type/socket enums as names,
    addresses as IPs, the event time from the response clock (falling
    back to the query clock), and the embedded DNS message's header +
    first question + canonical-JSON answers. Undecodable frames yield
    zero rows."""
    schema = (
        f"{id_col} bigint, message_type string, socket_family string, "
        "socket_protocol string, query_address string, "
        "response_address string, query_port int, response_port int, "
        "event_ts timestamp, dns_id int, rcode string, aa boolean, "
        "qname string, qtype string, answers string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    env = decode_message(DNSTAP_DESC, bytes(payload))
                    msg = decode_message(MESSAGE_DESC, env["message"])
                    wire = (msg.get("response_message")
                            or msg.get("query_message"))
                    dns = parse_dns_message(wire)
                except (ValueError, KeyError, TypeError, _struct.error):
                    continue
                sec = (msg.get("response_time_sec")
                       if msg.get("response_time_sec") is not None
                       else msg.get("query_time_sec"))
                nsec = (msg.get("response_time_nsec")
                        if msg.get("response_time_sec") is not None
                        else msg.get("query_time_nsec")) or 0
                ts = (
                    datetime.fromtimestamp(sec, tz=timezone.utc)
                    .replace(microsecond=nsec // 1000, tzinfo=None)
                    if sec is not None else None
                )
                q = dns["questions"][0] if dns["questions"] else ("", 0, 0)
                rows.append({
                    id_col: int(rid),
                    "message_type": MESSAGE_TYPES.get(msg.get("type")),
                    "socket_family": SOCKET_FAMILIES.get(
                        msg.get("socket_family")),
                    "socket_protocol": SOCKET_PROTOCOLS.get(
                        msg.get("socket_protocol")),
                    "query_address": _ip(msg.get("query_address")),
                    "response_address": _ip(msg.get("response_address")),
                    "query_port": msg.get("query_port"),
                    "response_port": msg.get("response_port"),
                    "event_ts": ts,
                    "dns_id": dns["id"],
                    "rcode": RCODES.get(dns["rcode"], str(dns["rcode"])),
                    "aa": dns["aa"],
                    "qname": q[0],
                    "qtype": QTYPES.get(q[1], str(q[1])),
                    "answers": json.dumps(
                        [
                            {"name": a[0],
                             "type": QTYPES.get(a[1], str(a[1])),
                             "ttl": a[3], "rdata": a[4]}
                            for a in dns["answers"]
                        ],
                        separators=(",", ":"),
                    ),
                })
            cols = [
                id_col, "message_type", "socket_family", "socket_protocol",
                "query_address", "response_address", "query_port",
                "response_port", "event_ts", "dns_id", "rcode", "aa",
                "qname", "qtype", "answers",
            ]
            out = pd.DataFrame(rows, columns=cols)
            out[id_col] = out[id_col].astype("int64")
            out["event_ts"] = out["event_ts"].astype("datetime64[us]")
            yield out

    return df.select(id_col, payload_col).mapInPandas(gen, schema)
