"""VRL function surface: parse family, grok expansion, strings, crypto,
ip, syslog maps, conditions compiler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition
from vector_spark.functions import crypto, ip, strings, syslog
from vector_spark.functions import parse as P
from vector_spark.functions.grok import grok_to_regex, parse_grok


def one(spark, col, **cols):
    """Evaluate column expression(s) against a single-row frame."""
    import json

    row_cols = cols or {"x": "1"}
    df = spark.createDataFrame(
        [tuple(row_cols.values())],
        ", ".join(f"{k} string" for k in row_cols),
    )
    del json
    return df.select(col.alias("r")).collect()[0].r


# --- parse ------------------------------------------------------------------


def test_parse_common_log_variants(spark):
    line = 'example.com - alice [2024-01-01 10:00:00] "GET /x/1 HTTP/1.1" 404 512'
    for fn in (P.parse_common_log, P.parse_common_log_fast):
        r = one(spark, fn(F.col("m")), m=line)
        assert r.host == "example.com" and r.user == "alice"
        assert r.method == "GET" and r.path == "/x/1"
        assert r.status == 404 and r.bytes == 512
    # miss → all-null struct
    r = one(spark, P.parse_common_log_fast(F.col("m")), m="garbage")
    assert r.host is None and r.status is None


def test_parse_apache_combined(spark):
    line = ('1.2.3.4 - bob [2024-01-01 10:00:00] "POST /y HTTP/2" 200 99 '
            '"http://ref" "curl/8.0"')
    r = one(spark, P.parse_apache_log(F.col("m"), "combined"), m=line)
    assert r.referrer == "http://ref" and r.agent == "curl/8.0"
    assert r.status == 200


def test_parse_syslog_5424(spark):
    line = '<165>1 2024-01-01T10:00:00Z host1 app 123 MSG7 [x@1 k="v"] hello world'
    r = one(spark, P.parse_syslog(F.col("m")), m=line)
    assert r.facility == 20 and r.severity == 5
    assert r.hostname == "host1" and r.appname == "app"
    assert r.structured_data == '[x@1 k="v"]' and r.message == "hello world"


def test_parse_bsd_syslog(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed"
    r = one(spark, P.parse_bsd_syslog(F.col("m")), m=line)
    assert r.facility == 4 and r.severity == 2
    assert r.hostname == "mymachine" and r.appname == "su" and r.procid == 230


def test_parse_kv_url_query(spark):
    r = one(spark, P.parse_key_value(F.col("m")), m="a=1 b=two")
    assert r == {"a": "1", "b": "two"}
    u = one(spark, P.parse_url(F.col("m")), m="https://h.io:8080/p/q?a=1#frag")
    assert u.scheme == "https" and u.host == "h.io" and u.port == 8080
    assert u.path == "/p/q" and u.query == {"a": "1"} and u.fragment == "frag"
    assert u.username == "" and u.password == ""
    q = one(spark, P.parse_query_string(F.col("m")), m="a=1&b=2")
    assert q == {"a": "1", "b": "2"}


def test_parse_scalars(spark):
    assert one(spark, P.parse_int(F.col("x")), x="42") == 42
    assert one(spark, P.parse_int(F.col("x")), x="nope") is None
    assert one(spark, P.parse_int(F.col("x"), base=16), x="0xff") == 255
    assert one(spark, P.parse_float(F.col("x")), x="2.5") == 2.5
    assert one(spark, P.parse_duration(F.col("x")), x="300ms") == pytest.approx(0.3)
    assert one(spark, P.parse_duration(F.col("x"), "ms"), x="2s") == pytest.approx(2000)


def test_parse_user_agent(spark):
    ua = ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
          "(KHTML, like Gecko) Chrome/120.0 Safari/537.36")
    r = one(spark, P.parse_user_agent(F.col("x")), x=ua)
    assert r.browser_family == "Chrome" and r.os_family == "Windows"


def test_parse_regex_all(spark):
    r = one(spark, P.parse_regex_all(F.col("x"), r"(\d+)"), x="a1 b22 c333")
    assert r == ["1", "22", "333"]


# --- grok -------------------------------------------------------------------


def test_grok_expansion():
    regex, fields = grok_to_regex("%{IPV4:ip} %{WORD:verb} %{NUMBER:code}")
    assert fields == ["ip", "verb", "code"]
    import re

    m = re.match(regex, "10.1.2.3 GET 200")
    assert m.group("ip") == "10.1.2.3" and m.group("code") == "200"


def test_grok_unknown_pattern():
    with pytest.raises(KeyError, match="NOPE"):
        grok_to_regex("%{NOPE:x}")


def test_parse_grok_fast_and_batch(spark):
    df = spark.createDataFrame(
        [("10.0.0.1 GET 200",), ("bad line !!",)], "m string"
    )
    # fast path (≤4 fields → per-field JVM regex)
    fast = df.select(
        parse_grok(F.col("m"), "%{IPV4:ip} %{WORD:verb} %{NUMBER:code}").alias("g")
    ).collect()
    assert fast[0].g.ip == "10.0.0.1" and fast[0].g.code == "200"
    assert fast[1].g.ip is None  # null on miss — SAME contract as batch path
    # batch path (>4 fields → single-pass pandas UDF)
    wide = parse_grok(
        F.col("m"),
        "%{IPV4:a} %{WORD:b} %{NUMBER:c}",
        fast_threshold=0,
    )
    batch = df.select(wide.alias("g")).collect()
    assert batch[0].g.a == "10.0.0.1"
    assert batch[1].g.a is None  # pandas extract: null on miss


# --- strings ----------------------------------------------------------------


def test_case_conversions(spark):
    src = F.col("x")
    assert one(spark, strings.snakecase(src), x="parseHTTPResponse") == "parse_httpresponse"
    assert one(spark, strings.snakecase(src), x="click-rate v2") == "click_rate_v2"
    assert one(spark, strings.kebabcase(src), x="myVar_name") == "my-var-name"
    assert one(spark, strings.camelcase(src), x="my_var_name") == "myVarName"
    assert one(spark, strings.pascalcase(src), x="my_var_name") == "MyVarName"
    assert one(spark, strings.screamingsnakecase(src), x="myVar") == "MY_VAR"


def test_string_edits(spark):
    x = F.col("x")
    assert one(spark, strings.truncate(x, 5, "..."), x="hello world") == "hello..."
    assert one(spark, strings.truncate(x, 50), x="short") == "short"
    assert one(spark, strings.slice_(x, 2, 5), x="abcdefg") == "cde"
    assert one(spark, strings.slice_(x, -3), x="abcdefg") == "efg"
    assert one(spark, strings.replace(x, r"\d+", "N"), x="a1b22") == "aNbN"
    assert one(spark, strings.redact(x, [r"\d{3}-\d{4}"]), x="call 555-1234 now") == "call [REDACTED] now"
    assert one(spark, strings.sieve(x, r"[0-9]+", ","), x="a12b345") == "12,345"
    assert one(spark, strings.strip_ansi_escape_codes(x), x="\x1b[31mred\x1b[0m") == "red"
    assert one(spark, strings.find(x, "lo"), x="hello") == 3
    assert one(spark, strings.find(x, "zz"), x="hello") == -1


def test_string_predicates(spark):
    x = F.col("x")
    assert one(spark, strings.contains_all(x, ["a", "b"]), x="abc")
    assert not one(spark, strings.contains_all(x, ["a", "z"]), x="abc")
    assert one(spark, strings.match_any(x, [r"^z", r"c$"]), x="abc")
    assert one(spark, strings.starts_with(x, "AB", case_sensitive=False), x="abc")


# --- crypto/encode ----------------------------------------------------------


def test_crypto_hashes(spark):
    import hashlib

    x = F.col("x")
    assert one(spark, crypto.md5(x), x="abc") == hashlib.md5(b"abc").hexdigest()
    assert one(spark, crypto.sha1(x), x="abc") == hashlib.sha1(b"abc").hexdigest()
    assert one(spark, crypto.sha2(x), x="abc") == hashlib.sha256(b"abc").hexdigest()
    assert one(spark, crypto.encode_base64(x), x="hi") == "aGk="
    assert one(spark, crypto.decode_base64(x), x="aGk=") == "hi"
    assert one(spark, crypto.encode_base16(x), x="hi") == "6869"
    # seahash stand-in: deterministic across calls
    a = one(spark, crypto.seahash(x), x="abc")
    b = one(spark, crypto.seahash(x), x="abc")
    assert a == b and isinstance(a, int)


def test_hmac_and_encode_kv(spark):
    import hashlib
    import hmac as h

    x = F.col("x")
    expect = h.new(b"key", b"msg", hashlib.sha256).hexdigest()
    assert one(spark, crypto.hmac_sha256(x, "key"), x="msg") == expect
    df = spark.createDataFrame([({"a": "1", "b": "2"},)], "m map<string,string>")
    r = df.select(crypto.encode_key_value(F.col("m")).alias("r")).collect()[0].r
    assert r in ("a=1 b=2", "b=2 a=1")


# --- ip ---------------------------------------------------------------------


def test_ip_functions(spark):
    x = F.col("x")
    assert one(spark, ip.ip_aton(x), x="10.0.0.1") == 10 * 16777216 + 1
    assert one(spark, ip.ip_ntoa(F.lit(167772161)), x="_") == "10.0.0.1"
    assert one(spark, ip.ip_subnet(x, 24), x="192.168.1.77") == "192.168.1.0"
    assert one(spark, ip.ip_cidr_contains("10.0.0.0/8", x), x="10.200.3.4")
    assert not one(spark, ip.ip_cidr_contains("10.0.0.0/8", x), x="11.0.0.1")
    assert one(spark, ip.is_ipv4(x), x="255.255.255.255")
    assert not one(spark, ip.is_ipv4(x), x="256.1.1.1")
    assert one(spark, ip.is_ipv6(x), x="fe80::1")


# --- syslog maps ------------------------------------------------------------


def test_syslog_maps(spark):
    assert one(spark, syslog.to_syslog_facility(F.lit(4)), x="_") == "auth"
    assert one(spark, syslog.to_syslog_level(F.lit(3)), x="_") == "err"
    assert one(spark, syslog.to_syslog_severity(F.col("x")), x="Warning") == 4


# --- conditions compiler ----------------------------------------------------


def test_condition_compiler(spark):
    df = spark.createDataFrame(
        [(500, "app", None), (200, "web", "u1")],
        "status long, src string, user string",
    )
    keep = df.filter(compile_condition(".status >= 400 && !exists(.user)"))
    assert keep.count() == 1
    keep2 = df.filter(
        compile_condition('(.src == "web" || .src == "app") && .status < 300')
    )
    assert keep2.count() == 1
    assert df.filter(compile_condition('contains(.src, "pp")')).count() == 1
    assert df.filter(compile_condition('match(.src, "^w")')).count() == 1
    assert df.filter(compile_condition("true")).count() == 2


def test_parse_gelf_and_encode_csv(spark):
    gelf = ('{"version":"1.1","host":"h1","short_message":"boom",'
            '"timestamp":1704067200.5,"level":3}')
    r = one(spark, P.parse_gelf(F.col("m")), m=gelf)
    assert r.host == "h1" and r.level == 3 and r.short_message == "boom"
    df = spark.createDataFrame([("a", 1, 2.5)], "x string, y long, z double")
    line = df.select(
        P.encode_csv([F.col("x"), F.col("y"), F.col("z")]).alias("c")
    ).collect()[0].c
    assert line == "a,1,2.5"


def test_parse_cef(spark):
    line = ("CEF:0|Security|threatmanager|1.0|100|worm stopped|10|"
            "src=10.0.0.1 dst=2.1.2.2 spt=1232")
    r = one(spark, P.parse_cef(F.col("m")), m=line)
    assert r.cef_version == 0 and r.device_vendor == "Security"
    assert r.name == "worm stopped" and r.severity == "10"
    assert r.extension == {"src": "10.0.0.1", "dst": "2.1.2.2", "spt": "1232"}


def test_encode_cef_roundtrip(spark):
    df = spark.createDataFrame([("worm|stopped", "a=b", 7)], "nm string, v string, sev long")
    line = df.select(
        P.encode_cef(
            F.lit("Sec|urity"), F.lit("tm"), F.lit("1.0"), F.lit("100"),
            F.col("nm"), F.col("sev"),
            [("src", F.lit("10.0.0.1")), ("note", F.col("v"))],
        ).alias("c")
    ).collect()[0].c
    assert line == (
        "CEF:0|Sec\\|urity|tm|1.0|100|worm\\|stopped|7|"
        "src=10.0.0.1 note=a\\=b"
    )
    r = one(spark, P.parse_cef(F.col("m")), m=line)
    assert r.device_vendor == "Sec|urity" and r.name == "worm|stopped"
    assert r.severity == "7" and r.extension["src"] == "10.0.0.1"


def test_encode_gelf(spark):
    df = spark.createDataFrame([("h1", "boom", 1704067200, 3, "x")],
                               "h string, m string, t long, l long, e string")
    payload = df.select(
        P.encode_gelf(F.col("h"), F.col("m"), F.col("t"), F.col("l"),
                      extra=[("facility", F.col("e"))]).alias("g")
    ).collect()[0].g
    assert payload == ('{"version":"1.1","host":"h1","short_message":"boom",'
                       '"timestamp":1704067200,"level":3,"_facility":"x"}')
    r = one(spark, P.parse_gelf(F.col("m")), m=payload)
    assert r.host == "h1" and r.level == 3 and r.timestamp == 1704067200.0


def test_parse_glog(spark):
    line = "E0817 02:30:00.123456  1234 server.cc:42] connection refused"
    r = one(spark, P.parse_glog(F.col("m")), m=line)
    assert r.level == "error" and r.file == "server.cc" and r.line == 42
    assert r.thread_id == 1234 and r.message == "connection refused"


def test_parse_groks_first_match_wins(spark):
    pats = ["%{IPV4:addr} in", "addr=%{IPV4:addr}"]
    df = spark.createDataFrame(
        [("1.2.3.4 in",), ("addr=5.6.7.8",), ("nothing",)], "m string"
    )
    rows = df.select(P.parse_groks(F.col("m"), pats).alias("g")).collect()
    assert rows[0].g.addr == "1.2.3.4"
    assert rows[1].g.addr == "5.6.7.8"
    assert rows[2].g.addr in (None, "")
    with pytest.raises(ValueError, match="field set"):
        P.parse_groks(F.col("m"), ["%{IPV4:a}", "%{IPV4:b}"])


def test_parse_linux_authorization(spark):
    line = "Aug 17 02:00:01 host1 sshd[123]: Accepted publickey for root"
    r = one(spark, P.parse_linux_authorization(F.col("m")), m=line)
    assert r.hostname == "host1" and r.appname == "sshd" and r.procid == 123
    assert r.message == "Accepted publickey for root"


def test_parse_aws_vpc_flow_log(spark):
    line = "2 123456789010 eni-abc123 172.31.16.139 172.31.16.21 20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK"
    r = one(spark, P.parse_aws_vpc_flow_log(F.col("m")), m=line)
    assert r.version == 2 and r.srcaddr == "172.31.16.139"
    assert r.dstport == 22 and r.bytes == 4249 and r.action == "ACCEPT"
    # NODATA line with '-' fields
    r2 = one(spark, P.parse_aws_vpc_flow_log(F.col("m")),
             m="2 123456789010 eni-abc123 - - - - - - - 1418530010 1418530070 - NODATA")
    assert r2.srcaddr is None and r2.packets is None and r2.log_status == "NODATA"


def test_chunks(spark):
    from vector_spark.functions.objects import chunks

    df = spark.createDataFrame([([1, 2, 3, 4, 5],)], "a array<int>")
    r = df.select(chunks(F.col("a"), 2).alias("c")).collect()[0].c
    assert r == [[1, 2], [3, 4], [5]]


def test_sha3_nist_vector(spark):
    # FIPS-202 example value: sha3-256("abc")
    from vector_spark.functions.crypto import sha3

    df = spark.createDataFrame([("abc",), (None,)], "t string")
    rows = df.select(sha3(F.col("t")).alias("h")).collect()
    assert rows[0].h == (
        "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"
    )
    assert rows[1].h is None


def test_parse_etld(spark):
    from vector_spark.functions.etld import parse_etld

    cases = [
        ("www.example.co.uk", "co.uk", "example.co.uk"),
        ("example.com", "com", "example.com"),
        ("a.b.github.io", "github.io", "b.github.io"),
        ("deep.sub.example.com.au", "com.au", "example.com.au"),
        ("com", "com", None),          # bare public suffix
        ("not-a-suffix.zz", None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "host string")
    got = {
        r.host: (r.p.etld, r.p.etld_plus)
        for r in df.select("host", parse_etld(F.col("host")).alias("p")).collect()
    }
    for host, etld, plus1 in cases:
        assert got[host] == (etld, plus1), (host, got[host])


def test_encrypt_decrypt_roundtrip(spark):
    key = "0123456789abcdef0123456789abcdef"  # 32 bytes → AES-256
    x = F.col("x")
    df = spark.createDataFrame([("secret payload",)], "x string")
    back = df.select(
        crypto.decrypt(crypto.encrypt(x, key), key).cast("string").alias("r")
    ).collect()[0].r
    assert back == "secret payload"
    # ECB is deterministic: two encryptions agree
    a = df.select(F.hex(crypto.encrypt(x, key)).alias("h")).collect()[0].h
    b = df.select(F.hex(crypto.encrypt(x, key)).alias("h")).collect()[0].h
    assert a == b
    # GCM round-trips too (random IV → not compared across calls)
    gcm = df.select(
        crypto.decrypt(
            crypto.encrypt(x, key, "AES-256-GCM"), key, "AES-256-GCM"
        ).cast("string").alias("r")
    ).collect()[0].r
    assert gcm == "secret payload"


def test_punycode_and_mime_q(spark):
    x = F.col("x")
    assert one(spark, crypto.encode_punycode(x), x="bücher.example") == (
        "xn--bcher-kva.example"
    )
    assert one(spark, crypto.decode_punycode(x), x="xn--bcher-kva.example") == (
        "bücher.example"
    )
    assert one(spark, crypto.decode_mime_q(x),
               x="=?utf-8?Q?Hello=2C_World!?=") == "Hello, World!"
    assert one(spark, crypto.decode_mime_q(x),
               x="=?utf-8?B?SGVsbG8=?=") == "Hello"


def test_uuid_from_friendly_id(spark):
    # base62("1") == uuid int 1
    x = F.col("x")
    assert one(spark, crypto.uuid_from_friendly_id(x), x="1") == (
        "00000000-0000-0000-0000-000000000001"
    )
    # round-trip a known 128-bit value through python base62
    n = 0x123E4567E89B12D3A456426614174000
    s = ""
    m = n
    B62 = crypto._B62
    while m:
        m, r = divmod(m, 62)
        s = B62[r] + s
    assert one(spark, crypto.uuid_from_friendly_id(x), x=s) == (
        "123e4567-e89b-12d3-a456-426614174000"
    )
    assert one(spark, crypto.uuid_from_friendly_id(x), x="!bad!") is None


def test_ip_v4_v6_conversions(spark):
    x = F.col("x")
    assert one(spark, ip.ip_to_ipv6(x), x="1.2.3.4") == "::ffff:1.2.3.4"
    assert one(spark, ip.ip_to_ipv6(x), x="2001:db8::1") == "2001:db8::1"
    assert one(spark, ip.ipv6_to_ipv4(x), x="::ffff:192.168.1.1") == "192.168.1.1"
    assert one(spark, ip.ipv6_to_ipv4(x), x="192.168.1.1") == "192.168.1.1"
    assert one(spark, ip.ipv6_to_ipv4(x), x="2001:db8::1") is None


def test_parse_influxdb(spark):
    """Line-protocol decode parity with the reference influxdb
    deserializer (one gauge per numeric field, strings dropped, bool →
    1/0, i-suffixed ints, escaped separators in identifiers)."""
    lines = [
        "cpu,host=h1,region=us usage=0.64,idle=99i 155681356109800",
        'disk,host=h\\ 2 free=10i,label="big disk" 7',
        "weird,t\\,ag=a\\=b va\\,lue=3.5,flag=t,off=F 8",
        "nots temp=1.5",
        'strs only="just text" 9',
        "sci big=1.5e3,neg=-2e-2 10",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    rows = df.select(
        F.explode_outer(P.parse_influxdb(F.col("line"))).alias("m")
    ).select("m.*").collect()
    got = {
        r.name: (r.value, dict(r.tags or {}), r.ts_ns)
        for r in rows
        if r.name is not None
    }
    assert got["cpu_usage"] == (0.64, {"host": "h1", "region": "us"}, 155681356109800)
    assert got["cpu_idle"][0] == 99.0
    assert got["disk_free"] == (10.0, {"host": "h 2"}, 7)
    assert "disk_label" not in got  # string field dropped
    assert got["weird_va,lue"] == (3.5, {"t,ag": "a=b"}, 8)
    assert got["weird_flag"][0] == 1.0 and got["weird_off"][0] == 0.0
    assert got["nots_temp"] == (1.5, {}, None)  # no timestamp
    assert got["sci_big"][0] == 1500.0 and got["sci_neg"][0] == -0.02
    # all-string fields → empty array (explode_outer null row only)
    assert not any(r.name is not None and r.name.startswith("strs") for r in rows)


def test_parse_ruby_hash_str():
    from vector_spark.functions.ruby_hash import parse_ruby_hash_str as p
    import json

    # the canonical VRL doc example (parse_ruby_hash.cue)
    got = json.loads(p('{ "test" => "value", "testNum" => 0.2, '
                       '"testObj" => { "testBool" => true } }'))
    assert got == {"test": "value", "testNum": 0.2,
                   "testObj": {"testBool": True}}
    # the cases a regex→JSON rewrite corrupts: '=>', 'nil', braces in strings
    got = json.loads(p('{"a" => "x => nil } {", "b" => nil}'))
    assert got == {"a": "x => nil } {", "b": None}
    # symbol keys, arrays, ints with underscores, floats, sci, bools
    got = json.loads(p('{:sym => [1, 2_000, -3.5, 1e2, true, false, nil]}'))
    assert got == {"sym": [1, 2000, -3.5, 100.0, True, False, None]}
    # single-quoted strings: only \' and \\ unescape; others literal
    got = json.loads(p(r"{'k' => 'it\'s a \\ \n'}"))
    assert got == {"k": "it's a \\ \\n"}
    # double-quoted escapes incl. \u
    got = json.loads(p('{"k" => "a\\tb\\u00e9\\"q\\""}'))
    assert got == {"k": 'a\tb\xe9"q"'}
    # nested + empty collections
    assert json.loads(p('{"a" => {}, "b" => []}')) == {"a": {}, "b": []}
    # misses → None: not a hash, trailing garbage, unterminated, bad token
    for bad in ("[1,2]", '{"a" => 1} x', '{"a" => ', '{"a" => foo}',
                '{"a" = 1}', "", "plain text"):
        assert p(bad) is None


def test_parse_ruby_hash_column(spark):
    from vector_spark.functions.ruby_hash import parse_ruby_hash

    df = spark.createDataFrame(
        [('{"u" => 7, :tags => ["a","b"], "m" => {"ok" => true}}',),
         ("not a hash",), (None,)],
        "line string",
    )
    out = df.select(
        parse_ruby_hash(F.col("line")).alias("js")
    ).select(
        F.get_json_object("js", "$.u").cast("long").alias("u"),
        F.get_json_object("js", "$.tags[1]").alias("t1"),
        F.get_json_object("js", "$.m.ok").cast("boolean").alias("ok"),
        F.col("js").isNull().alias("miss"),
    ).collect()
    assert (out[0].u, out[0].t1, out[0].ok, out[0].miss) == (7, "b", True, False)
    assert out[1].miss and out[2].miss


def test_random_bytes_deterministic(spark):
    import hashlib

    df = spark.createDataFrame([("seed-a",), ("seed-b",)], "s string")
    out = df.select(
        "s",
        F.hex(crypto.random_bytes(16, F.col("s"))).alias("h16"),
        F.hex(crypto.random_bytes(48, F.col("s"))).alias("h48"),
        F.length(crypto.random_bytes(48, F.col("s"))).alias("n"),
    ).collect()
    by_seed = {r.s: r for r in out}
    # reference PRF: sha256(seed:0) || sha256(seed:1), truncated
    for s, r in by_seed.items():
        b0 = hashlib.sha256(f"{s}:0".encode()).hexdigest()
        b1 = hashlib.sha256(f"{s}:1".encode()).hexdigest()
        assert r.h16.lower() == b0[:32]
        assert r.h48.lower() == (b0 + b1)[:96]
        assert r.n == 48
    assert by_seed["seed-a"].h16 != by_seed["seed-b"].h16
    with pytest.raises(ValueError):
        crypto.random_bytes(0, F.lit("x"))
