"""dnstap decoder (sources/dnstap.py): dnstap.proto envelope + RFC 1035
wire parsing vs reference src/sources/dnstap + lib/dnsmsg-parser."""

from __future__ import annotations

import json
import struct

import pytest

from vector_spark.sources import dnstap as DT


def test_dns_response_round_trip_with_compression():
    wire = DT.encode_dns_response(
        0xBEEF, "www.example.com", qtype=1,
        answers=[
            (1, 300, bytes([93, 184, 216, 34])),           # A
            (5, 600, DT.encode_name("cdn.example.net")),   # CNAME
        ],
        aa=True,
    )
    dns = DT.parse_dns_message(wire)
    assert dns["id"] == 0xBEEF
    assert dns["qr"] and dns["aa"] and dns["rd"] and dns["ra"]
    assert dns["rcode"] == 0
    assert dns["questions"] == [("www.example.com", 1, 1)]
    # answer names are compression pointers back to the question name
    assert dns["answers"][0] == ("www.example.com", 1, 1, 300, "93.184.216.34")
    assert dns["answers"][1][4] == "cdn.example.net"


def test_rdata_decoders():
    aaaa = DT.encode_dns_response(
        1, "v6.example.com", qtype=28,
        answers=[(28, 60, bytes.fromhex("20010db8" + "00" * 10 + "0001"))],
    )
    assert DT.parse_dns_message(aaaa)["answers"][0][4] == "2001:db8::1"
    mx = DT.encode_dns_response(
        2, "example.com", qtype=15,
        answers=[(15, 60, struct.pack(">H", 10) + DT.encode_name("mail.example.com"))],
    )
    assert DT.parse_dns_message(mx)["answers"][0][4] == "10 mail.example.com"
    txt = DT.encode_dns_response(
        3, "example.com", qtype=16,
        answers=[(16, 60, b"\x05hello\x06 world")],
    )
    assert DT.parse_dns_message(txt)["answers"][0][4] == "hello world"


def test_pointer_loop_rejected():
    # a name that points at itself
    hdr = struct.pack(">HHHHHH", 1, 0x8000, 1, 0, 0, 0)
    bad = hdr + b"\xc0\x0c" + struct.pack(">HH", 1, 1)
    with pytest.raises(ValueError):
        DT.parse_dns_message(bad)


def test_parse_dnstap_spark(spark):
    wire = DT.encode_dns_response(
        7, "api.example.org", qtype=1,
        answers=[(1, 120, bytes([10, 0, 0, 7]))], rcode=0,
    )
    frame = DT.encode_dnstap_frame(
        6,  # CLIENT_RESPONSE
        wire,
        query_address=bytes([192, 168, 1, 50]),
        response_address=bytes([10, 0, 0, 53]),
        query_port=54321, response_port=53,
        time_sec=1_700_000_000, time_nsec=123_000_000,
        socket_family=1, socket_protocol=1,
    )
    nx = DT.encode_dnstap_frame(
        5,  # CLIENT_QUERY — query_message side, query clock
        DT.encode_dns_response(9, "miss.example.org", qtype=28, rcode=3),
        time_sec=1_700_000_001,
        socket_protocol=2,
    )
    df = spark.createDataFrame(
        [(1, frame), (2, nx), (3, b"junk")],
        "event_id bigint, payload binary",
    )
    out = {r.event_id: r for r in DT.parse_dnstap(df).collect()}
    assert set(out) == {1, 2}
    r = out[1]
    assert r.message_type == "CLIENT_RESPONSE"
    assert (r.socket_family, r.socket_protocol) == ("INET", "UDP")
    assert (r.query_address, r.response_address) == ("192.168.1.50", "10.0.0.53")
    assert (r.query_port, r.response_port) == (54321, 53)
    assert r.event_ts.microsecond == 123_000
    assert (r.dns_id, r.rcode, r.qname, r.qtype) == (7, "NoError", "api.example.org", "A")
    assert json.loads(r.answers) == [
        {"name": "api.example.org", "type": "A", "ttl": 120,
         "rdata": "10.0.0.7"}
    ]
    assert (out[2].rcode, out[2].qtype, out[2].socket_protocol) == (
        "NXDomain", "AAAA", "TCP"
    )
    assert out[2].answers == "[]"
