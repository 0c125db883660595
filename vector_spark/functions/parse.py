"""VRL parse_* family → Column builders.

Parity targets are the VRL function docs (reference
website/cue/reference/remap/functions/parse_*.cue). Every function here
returns a struct/map Column; misses yield nulls (the caller's remap error
channel decides drop/reroute). Built-in JVM expressions wherever possible;
grok-class parses delegate to vector_spark.functions.grok.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.grok import parse_grok  # noqa: F401  (re-export)

# --- structured formats ------------------------------------------------------


def parse_json(col: Column, schema: str) -> Column:
    """parse_json with a declared schema (schema-first engine; use
    ``parse_json_map`` for open objects)."""
    return F.from_json(col, schema)


def parse_json_map(col: Column) -> Column:
    """parse_json for open/unknown objects → map<string,string>."""
    return F.from_json(col, "map<string,string>")


def parse_csv(col: Column, schema: str, sep: str = ",") -> Column:
    return F.from_csv(col, schema, {"sep": sep})


def parse_key_value(
    col: Column, pair_sep: str = " ", kv_sep: str = "="
) -> Column:
    """parse_key_value / parse_logfmt → map<string,string>.

    Reference semantics (parse_key_value.cue, remap.toml:1875-1905): split
    on the field delimiter (runs collapse; double-quoted segments may
    embed it), trim whitespace, strip one layer of surrounding double
    quotes, accept standalone keys (value ""), first occurrence wins on
    duplicate keys. Pure JVM column math.
    """
    import re as _re

    ps, ks = _re.escape(pair_sep), _re.escape(kv_sep)
    ws = F.lit(r"^\s+|\s+$")

    def _clean(v: Column) -> Column:
        v = F.regexp_replace(v, ws, F.lit(""))
        return F.regexp_replace(v, F.lit('^"(.*)"$'), F.lit("$1"))

    def _entry(t: Column) -> Column:
        kvp = F.split(t, ks, 2)
        return F.struct(
            _clean(F.get(kvp, 0)).alias("key"),
            _clean(F.coalesce(F.get(kvp, 1), F.lit(""))).alias("value"),
        )

    # quote-aware tokenizer: a token is a run of non-delimiter chars where
    # "…" segments may contain the delimiter
    toks = F.regexp_extract_all(
        col, F.lit(f'(?:[^{ps}"]|"[^"]*")+'), F.lit(0)
    )
    entries = F.filter(
        F.transform(toks, _entry), lambda e: e.getField("key") != ""
    )
    first_win = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, F.lit(1), i),
            lambda p: p.getField("key") == e.getField("key"),
        ),
    )
    return F.map_from_entries(first_win)


parse_logfmt = parse_key_value


def parse_url(col: Column) -> Column:
    """parse_url (parse_url.cue) → struct(scheme, username, password, host,
    port, path, query, fragment); query is a map like the reference."""
    userinfo = F.parse_url(col, F.lit("USERINFO"))
    query = F.parse_url(col, F.lit("QUERY"))
    return F.struct(
        F.parse_url(col, F.lit("PROTOCOL")).alias("scheme"),
        F.coalesce(F.substring_index(userinfo, ":", 1), F.lit("")).alias(
            "username"
        ),
        F.coalesce(
            F.when(
                userinfo.contains(":"), F.substring_index(userinfo, ":", -1)
            ),
            F.lit(""),
        ).alias("password"),
        F.parse_url(col, F.lit("HOST")).alias("host"),
        # Spark parse_url has no PORT key — take it off the authority
        F.nullif(
            F.regexp_extract(F.parse_url(col, F.lit("AUTHORITY")), r":(\d+)$", 1),
            F.lit(""),
        ).cast("int").alias("port"),
        F.parse_url(col, F.lit("PATH")).alias("path"),
        F.when(query.isNotNull(), F.str_to_map(query, F.lit("&"), F.lit("=")))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("query"),
        F.parse_url(col, F.lit("REF")).alias("fragment"),
    )


def parse_query_string(col: Column) -> Column:
    """parse_query_string → map<string,string> (``a=1&b=2``)."""
    return F.str_to_map(col, F.lit("&"), F.lit("="))


GELF_SCHEMA = (
    "version string, host string, short_message string, full_message string, "
    "timestamp double, level int, facility string"
)


def parse_gelf(col: Column) -> Column:
    """GELF decode (reference lib/codecs decoding format ``gelf``): the
    fixed fields as a typed struct; additional ``_``-prefixed fields are
    available via :func:`parse_json_map` on the same column."""
    return F.from_json(col, GELF_SCHEMA)


def encode_csv(cols: list[Column]) -> Column:
    """CSV encode (reference encoding format ``csv``): one CSV line from
    the given columns."""
    return F.to_csv(F.struct(*cols))


# --- log-line formats (regex family — the perf-critical core) ---------------

# Apache/nginx common log: host ident user [time] "method path proto" status bytes
COMMON_LOG_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\S+)'
)
# combined adds "referrer" "agent"
COMBINED_LOG_RE = COMMON_LOG_RE + r' "([^"]*)" "([^"]*)"'


def parse_common_log(col: Column, ts_format: str | None = None) -> Column:
    """parse_common_log / parse_apache_log(common) → typed struct.

    Pure JVM ``regexp_extract`` (whole-stage codegen; this is the hot path
    the reference benchmarks at 13.2 MiB/s — see BASELINE.md §1).
    """
    g = lambda i: F.regexp_extract(col, COMMON_LOG_RE, i)  # noqa: E731
    ts = g(4)
    return F.struct(
        F.nullif(g(1), F.lit("")).alias("host"),
        F.nullif(g(2), F.lit("")).alias("ident"),
        F.nullif(g(3), F.lit("")).alias("user"),
        # misses yield NULL (module contract) — never an ANSI throw
        (F.try_to_timestamp(ts, F.lit(ts_format)) if ts_format else F.try_to_timestamp(ts)).alias("timestamp"),
        F.nullif(g(5), F.lit("")).alias("method"),
        F.nullif(g(6), F.lit("")).alias("path"),
        F.nullif(g(7), F.lit("")).alias("protocol"),
        F.nullif(g(8), F.lit("")).cast("int").alias("status"),
        F.when(g(9) == "-", None).otherwise(F.nullif(g(9), F.lit(""))).cast("long").alias("bytes"),
    )


_CLF_SEP = "\x01"


def parse_common_log_fast(col: Column, ts_format: str | None = None) -> Column:
    """Single-regex-pass variant of :func:`parse_common_log`.

    One JVM regex evaluation per row: ``regexp_replace`` rewrites the line to
    a ``\\x01``-separated field list (capture-group backreferences), then a
    cheap ``split`` fans the fields out. ~5× fewer regex executions than the
    per-field ``regexp_extract`` form; same schema and null-on-miss
    semantics (a non-matching line keeps no separator → all fields null).

    Perf: ALWAYS pass ``ts_format`` when you know it — ``to_timestamp``
    with format inference measures ~4× the cost of the entire rest of the
    parse (3.1 s vs 0.9 s per 1M rows at local[32]).
    """
    packed = F.regexp_replace(
        col,
        COMMON_LOG_RE,
        _CLF_SEP.join(f"${i}" for i in range(1, 10)),
    )
    ok = packed.contains(_CLF_SEP)
    parts = F.split(packed, _CLF_SEP)
    g = lambda i: F.when(ok, F.element_at(parts, i))  # noqa: E731
    ts = g(4)
    return F.struct(
        g(1).alias("host"),
        g(2).alias("ident"),
        g(3).alias("user"),
        # misses yield NULL (module contract) — never an ANSI throw
        (F.try_to_timestamp(ts, F.lit(ts_format)) if ts_format else F.try_to_timestamp(ts)).alias("timestamp"),
        g(5).alias("method"),
        g(6).alias("path"),
        g(7).alias("protocol"),
        g(8).cast("int").alias("status"),
        F.when(g(9) == "-", None).otherwise(g(9)).cast("long").alias("bytes"),
    )


def parse_apache_log(col: Column, format: str = "common", ts_format: str | None = None) -> Column:
    if format == "common":
        return parse_common_log(col, ts_format)
    if format == "combined":
        g = lambda i: F.regexp_extract(col, COMBINED_LOG_RE, i)  # noqa: E731
        base = parse_common_log(col, ts_format)
        return base.withField("referrer", F.nullif(g(10), F.lit(""))).withField(
            "agent", F.nullif(g(11), F.lit(""))
        )
    raise ValueError(f"unsupported apache log format {format!r}")


parse_nginx_log = parse_common_log  # nginx 'combined'/'main' share the shape

# RFC 5424: <pri>version ts hostname app-name procid msgid [sd] msg
SYSLOG_5424_RE = (
    r"^<(\d+)>(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) (?:(\[.*?\]|-) )?(.*)$"
)
# RFC 3164: <pri>Mmm dd hh:mm:ss host tag[pid]: msg
SYSLOG_3164_RE = (
    r"^<(\d+)>(\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}) (\S+) ([^:\[\s]+)(?:\[(\d+)\])?:? ?(.*)$"
)


def parse_syslog(col: Column) -> Column:
    """parse_syslog (RFC 5424) → typed struct; facility/severity decoded
    from PRI (pri = facility*8 + severity)."""
    g = lambda i: F.regexp_extract(col, SYSLOG_5424_RE, i)  # noqa: E731
    pri = F.nullif(g(1), F.lit("")).cast("int")
    return F.struct(
        (pri / 8).cast("int").alias("facility"),
        (pri % 8).cast("int").alias("severity"),
        F.nullif(g(2), F.lit("")).cast("int").alias("version"),
        F.try_to_timestamp(F.nullif(g(3), F.lit(""))).alias("timestamp"),
        F.when(g(4) == "-", None).otherwise(F.nullif(g(4), F.lit(""))).alias("hostname"),
        F.when(g(5) == "-", None).otherwise(F.nullif(g(5), F.lit(""))).alias("appname"),
        F.when(g(6) == "-", None).otherwise(F.nullif(g(6), F.lit(""))).alias("procid"),
        F.when(g(7) == "-", None).otherwise(F.nullif(g(7), F.lit(""))).alias("msgid"),
        F.when(g(8) == "-", None).otherwise(F.nullif(g(8), F.lit(""))).alias("structured_data"),
        F.nullif(g(9), F.lit("")).alias("message"),
    )


def parse_bsd_syslog(col: Column) -> Column:
    """parse_syslog (RFC 3164 / BSD)."""
    g = lambda i: F.regexp_extract(col, SYSLOG_3164_RE, i)  # noqa: E731
    pri = F.nullif(g(1), F.lit("")).cast("int")
    return F.struct(
        (pri / 8).cast("int").alias("facility"),
        (pri % 8).cast("int").alias("severity"),
        F.nullif(g(2), F.lit("")).alias("timestamp_raw"),
        F.nullif(g(3), F.lit("")).alias("hostname"),
        F.nullif(g(4), F.lit("")).alias("appname"),
        F.nullif(g(5), F.lit("")).cast("int").alias("procid"),
        F.nullif(g(6), F.lit("")).alias("message"),
    )


def parse_groks(col: Column, patterns: list[str], extra: dict[str, str] | None = None) -> Column:
    """parse_groks: first matching pattern wins (all patterns must expose
    the same field set; null-struct when none match)."""
    from vector_spark.functions.grok import grok_to_regex, parse_grok

    field_sets = [tuple(grok_to_regex(p, extra)[1]) for p in patterns]
    if len(set(field_sets)) != 1:
        raise ValueError("parse_groks patterns must share one field set")
    parsed = [parse_grok(col, p, extra) for p in patterns]
    first_field = field_sets[0][0]
    out = parsed[-1]
    for p in reversed(parsed[:-1]):
        out = F.when(p[first_field].isNotNull() & (p[first_field] != ""), p).otherwise(out)
    return out


# CEF: "CEF:version|vendor|product|device_version|event_class|name|severity|ext"
# Header fields may contain CEF-escaped pipes/backslashes (\| \\) — the
# field pattern consumes escape pairs atomically, matching the reference
# parser (lib/codecs decoding format cef).
_CEF_F = r"((?:\\.|[^|\\])*)"
CEF_RE = r"^CEF:(\d+)\|" + r"\|".join([_CEF_F] * 6) + r"\|(.*)$"


def parse_cef(col: Column) -> Column:
    """parse_cef → header struct + extension map (key=value pairs).

    Header fields are CEF-unescaped (``\\|`` → ``|``, ``\\\\`` → ``\\``);
    the extension map assumes unescaped separators (reference parity for
    the common case — escaped ``=`` inside extension values keeps the raw
    backslash in the map value).
    """
    g = lambda i: F.regexp_extract(col, CEF_RE, i)  # noqa: E731
    un = lambda c: F.regexp_replace(c, r"\\(.)", "$1")  # noqa: E731
    return F.struct(
        F.nullif(g(1), F.lit("")).cast("int").alias("cef_version"),
        F.nullif(un(g(2)), F.lit("")).alias("device_vendor"),
        F.nullif(un(g(3)), F.lit("")).alias("device_product"),
        F.nullif(un(g(4)), F.lit("")).alias("device_version"),
        F.nullif(un(g(5)), F.lit("")).alias("device_event_class_id"),
        F.nullif(un(g(6)), F.lit("")).alias("name"),
        F.nullif(un(g(7)), F.lit("")).alias("severity"),
        F.str_to_map(g(8), F.lit(" "), F.lit("=")).alias("extension"),
    )


def _cef_escape(col: Column, header: bool) -> Column:
    """CEF escaping (public ArcSight CEF spec; reference
    lib/codecs/src/encoding/format/cef.rs): backslash always doubles;
    header fields escape ``|``, extension values escape ``=``."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    special = "|" if header else "="
    return F.replace(out, F.lit(special), F.lit("\\" + special))


def encode_cef(
    device_vendor: Column,
    device_product: Column,
    device_version: Column,
    device_event_class_id: Column,
    name: Column,
    severity: Column,
    extension: list[tuple[str, Column]],
    cef_version: int = 0,
) -> Column:
    """encode_cef (reference encoding format ``cef``): one CEF line
    ``CEF:v|vendor|product|version|class|name|severity|k=v k2=v2``.

    ``extension`` is an ordered list of (key, value-column) pairs —
    CEF extension order is config-declared in the reference encoder, so
    the caller controls it here too. Pure JVM string expressions.
    """
    header = F.concat_ws(
        "|",
        *[
            _cef_escape(c.cast("string"), header=True)
            for c in (
                device_vendor,
                device_product,
                device_version,
                device_event_class_id,
                name,
                severity,
            )
        ],
    )
    ext = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(k + "="), _cef_escape(v.cast("string"), header=False))
            for k, v in extension
        ],
    )
    return F.concat(F.lit(f"CEF:{cef_version}|"), header, F.lit("|"), ext)


def encode_gelf(
    host: Column,
    short_message: Column,
    timestamp_s: Column,
    level: Column,
    extra: list[tuple[str, Column]] | None = None,
) -> Column:
    """encode_gelf (reference encoding format ``gelf``): a GELF 1.1 JSON
    payload. ``timestamp_s`` is unix seconds (integral — GELF permits
    omitting the fractional part); ``extra`` keys are stamped with the
    spec's ``_`` additional-field prefix. Pure ``to_json`` — JVM-side.
    """
    fields = [
        F.lit("1.1").alias("version"),
        host.alias("host"),
        short_message.alias("short_message"),
        timestamp_s.cast("long").alias("timestamp"),
        level.cast("int").alias("level"),
    ]
    for k, v in extra or []:
        key = k if k.startswith("_") else "_" + k
        fields.append(v.alias(key))
    return F.to_json(F.struct(*fields))


# glog: "Lmmdd hh:mm:ss.uuuuuu threadid file:line] msg"
# date group: glog's classic mmdd or the yyyymmdd long form
GLOG_RE = r"^([IWEF])(\d{8}|\d{4}) (\d{2}:\d{2}:\d{2}\.\d+)\s+(\d+) ([^:]+):(\d+)\] (.*)$"
_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def parse_tokens(col: Column) -> Column:
    """parse_tokens (VRL parse_tokens.cue): split a line into tokens —
    whitespace-delimited, but ``[…]`` and ``"…"`` groups stay one token with
    the delimiters stripped; a bare ``-`` token becomes NULL."""
    raw = F.regexp_extract_all(
        col, F.lit(r'(\[[^\]]*\]|"[^"]*"|\S+)'), 1
    )
    return F.transform(
        raw,
        lambda t: F.nullif(
            F.when(
                t.rlike(r'^\[.*\]$') | t.rlike(r'^".*"$'),
                F.substring(t, 2, F.length(t) - 2),
            ).otherwise(t),
            F.lit("-"),
        ),
    )


def parse_glog(col: Column) -> Column:
    """parse_glog (Google log format) → typed struct."""
    g = lambda i: F.regexp_extract(col, GLOG_RE, i)  # noqa: E731
    level = F.nullif(g(1), F.lit(""))
    level_name = None
    for k, v in _GLOG_LEVELS.items():
        level_name = (
            F.when(level == k, v) if level_name is None else level_name.when(level == k, v)
        )
    return F.struct(
        level_name.alias("level"),
        F.nullif(g(2), F.lit("")).alias("mmdd"),
        F.nullif(g(3), F.lit("")).alias("time"),
        F.nullif(g(4), F.lit("")).cast("long").alias("thread_id"),
        F.nullif(g(5), F.lit("")).alias("file"),
        F.nullif(g(6), F.lit("")).cast("int").alias("line"),
        F.nullif(g(7), F.lit("")).alias("message"),
    )


def parse_linux_authorization(col: Column) -> Column:
    """parse_linux_authorization: BSD-syslog auth lines (sshd/su/sudo),
    e.g. ``Aug 17 02:00:01 host1 sshd[123]: Accepted publickey for root``.
    Same shape as parse_bsd_syslog minus the <pri> prefix."""
    rx = r"^(\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}) (\S+) ([^:\[\s]+)(?:\[(\d+)\])?: (.*)$"
    g = lambda i: F.regexp_extract(col, rx, i)  # noqa: E731
    return F.struct(
        F.nullif(g(1), F.lit("")).alias("timestamp_raw"),
        F.nullif(g(2), F.lit("")).alias("hostname"),
        F.nullif(g(3), F.lit("")).alias("appname"),
        F.nullif(g(4), F.lit("")).cast("int").alias("procid"),
        F.nullif(g(5), F.lit("")).alias("message"),
    )


_VPC_FLOW_FIELDS = (
    "version account_id interface_id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log_status"
).split()
_VPC_INT_FIELDS = {"version", "srcport", "dstport", "protocol", "packets",
                   "bytes", "start", "end"}


def parse_aws_vpc_flow_log(col: Column, format: str | None = None) -> Column:
    """parse_aws_vpc_flow_log: space-separated fields → typed struct
    ('-' → null). ``format`` overrides the default v2 field list with a
    space-separated field-name string (parse_aws_vpc_flow_log.cue)."""
    fields = format.split() if format else _VPC_FLOW_FIELDS
    parts = F.split(col, " ")
    out = []
    for i, name in enumerate(fields):
        v = F.when(F.element_at(parts, i + 1) == "-", None).otherwise(
            F.element_at(parts, i + 1)
        )
        if name in _VPC_INT_FIELDS:
            v = v.cast("long")
        out.append(v.alias(name))
    return F.struct(*out)


_ALB_FIELDS = [
    ("type", "str"), ("timestamp", "str"), ("elb", "str"),
    ("client_host", "str"), ("target_host", "str"),
    ("request_processing_time", "double"),
    ("target_processing_time", "double"),
    ("response_processing_time", "double"),
    ("elb_status_code", "str"), ("target_status_code", "str"),
    ("received_bytes", "long"), ("sent_bytes", "long"),
    ("request", "req"), ("user_agent", "str"), ("ssl_cipher", "str"),
    ("ssl_protocol", "str"), ("target_group_arn", "str"),
    ("trace_id", "str"), ("domain_name", "str"), ("chosen_cert_arn", "str"),
    ("matched_rule_priority", "str"), ("request_creation_time", "str"),
    ("actions_executed", "str"), ("redirect_url", "str"),
    ("error_reason", "str"), ("target_port_list", "str"),
    ("target_status_code_list", "str"), ("classification", "str"),
    ("classification_reason", "str"),
]


def parse_aws_alb_log(col: Column) -> Column:
    """parse_aws_alb_log (parse_aws_alb_log.cue): the AWS ALB access-log
    line → typed struct. Space-split with quoted groups kept whole; '-' →
    null; the quoted request splits into request_method / request_url /
    request_protocol."""
    toks = F.regexp_extract_all(col, F.lit(r'("[^"]*"|\S+)'), 1)

    def tok(i: int) -> Column:
        t = F.element_at(toks, i + 1)
        t = F.when(
            t.rlike(r'^".*"$'), F.substring(t, 2, F.length(t) - 2)
        ).otherwise(t)
        return F.when(t.isin("-", ""), None).otherwise(t)

    out = []
    for i, (name, kind) in enumerate(_ALB_FIELDS):
        t = tok(i)
        if kind == "req":
            parts = F.split(t, " ")
            out.append(F.element_at(parts, 1).alias("request_method"))
            out.append(F.element_at(parts, 2).alias("request_url"))
            out.append(F.element_at(parts, 3).alias("request_protocol"))
        elif kind in ("double", "long"):
            # ALB uses -1 for "no target"; keep the reference's raw value
            out.append(t.cast(kind).alias(name))
        else:
            out.append(t.alias(name))
    return F.struct(*out)


def parse_aws_cloudwatch_log_subscription_message(col: Column) -> Column:
    """parse_aws_cloudwatch_log_subscription_message
    (parse_aws_cloudwatch_log_subscription_message.cue): typed from_json of
    the Firehose/CloudWatch Logs subscription envelope, epoch-millis event
    timestamps → timestamp."""
    raw = F.from_json(
        col,
        "messageType string, owner string, logGroup string, "
        "logStream string, subscriptionFilters array<string>, "
        "logEvents array<struct<id string, timestamp long, message string>>",
    )
    return F.struct(
        raw["owner"].alias("owner"),
        raw["messageType"].alias("message_type"),
        raw["logGroup"].alias("log_group"),
        raw["logStream"].alias("log_stream"),
        raw["subscriptionFilters"].alias("subscription_filters"),
        F.transform(
            raw["logEvents"],
            lambda e: F.struct(
                e["id"].alias("id"),
                F.timestamp_millis(e["timestamp"]).alias("timestamp"),
                e["message"].alias("message"),
            ),
        ).alias("log_events"),
    )


def parse_regex(col: Column, pattern: str, fields: list[str]) -> Column:
    """parse_regex: named extraction via JVM regexp_extract per group.

    ``fields[i]`` names capture group i+1. Null on miss.
    """
    return F.struct(
        *[
            F.nullif(F.regexp_extract(col, pattern, i + 1), F.lit("")).alias(f)
            for i, f in enumerate(fields)
        ]
    )


def parse_regex_all(col: Column, pattern: str) -> Column:
    """parse_regex_all: every match of group 1 → array<string>."""
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(1))


# --- scalars -----------------------------------------------------------------


def parse_int(col: Column, base: int = 10) -> Column:
    """Fallible (VRL semantics): null on malformed input — ``try_cast``,
    not ``cast`` (Spark 4 ANSI mode makes plain cast THROW on bad input)."""
    if base == 10:
        return col.try_cast("long")
    if base == 16:
        return F.conv(F.regexp_replace(col, "^0[xX]", ""), 16, 10).try_cast("long")
    if base == 8:
        return F.conv(col, 8, 10).try_cast("long")
    raise ValueError("base must be 8, 10 or 16")


def parse_float(col: Column) -> Column:
    """Fallible: null on malformed input (see parse_int)."""
    return col.try_cast("double")


def parse_timestamp(col: Column, format: str | None = None) -> Column:
    # fallible per the VRL error model: malformed input -> NULL
    return F.try_to_timestamp(col, F.lit(format)) if format else F.try_to_timestamp(col)


def parse_duration(col: Column, unit: str = "s") -> Column:
    """parse_duration: '300ms' / '2.5 s' / '1m' / '1h' → seconds (double),
    then converted to ``unit`` (s|ms|us|ns|m|h)."""
    num = F.regexp_extract(col, r"([0-9]*\.?[0-9]+)", 1).cast("double")
    u = F.regexp_extract(col, r"[0-9.]+\s*([a-zµ]+)", 1)
    secs = (
        F.when(u == "ns", num / 1e9)
        .when(u.isin("us", "µs"), num / 1e6)
        .when(u == "ms", num / 1e3)
        .when(u == "s", num)
        .when(u == "m", num * 60)
        .when(u == "h", num * 3600)
        .when(u == "d", num * 86400)
    )
    factor = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9, "m": 1 / 60, "h": 1 / 3600}[unit]
    return secs * factor


def parse_user_agent(col: Column) -> Column:
    """parse_user_agent (``fast`` mode): browser/os family via regex
    heuristics (the reference's full device DB is out of scope)."""
    browser = (
        F.when(col.rlike(r"Firefox/"), "Firefox")
        .when(col.rlike(r"Edg(e|A|iOS)?/"), "Edge")
        .when(col.rlike(r"OPR/|Opera"), "Opera")
        .when(col.rlike(r"Chrome/"), "Chrome")
        .when(col.rlike(r"Safari/"), "Safari")
        .when(col.rlike(r"curl/"), "curl")
    )
    os_ = (
        F.when(col.rlike(r"Windows NT"), "Windows")
        .when(col.rlike(r"Android"), "Android")
        .when(col.rlike(r"iPhone|iPad|iOS"), "iOS")
        .when(col.rlike(r"Mac OS X"), "macOS")
        .when(col.rlike(r"Linux"), "Linux")
    )
    return F.struct(browser.alias("browser_family"), os_.alias("os_family"))


def parse_xml(col: Column, schema: str) -> Column:
    """parse_xml (VRL parse_xml.cue) via Spark 4's built-in ``from_xml`` —
    JVM-side StAX parsing, no Python. ``schema`` is a DDL struct string,
    e.g. ``"a INT, b STRING, _attr STRING"`` (attributes prefix ``_``)."""
    from pyspark.sql.functions import from_xml

    return from_xml(col, schema)


def _ilp_escape(c: Column) -> Column:
    """Escape `,`, ` ` and `=` for ILP identifiers (measurement/tag/key)."""
    return F.regexp_replace(c, r"([,= ])", r"\\$1")


def encode_influxdb(
    measurement: Column,
    tags: list[tuple[str, Column]],
    fields: list[tuple[str, Column]],
    ts_ns: Column | None = None,
) -> Column:
    """encode_influxdb (reference influxdb metrics sink wire format): one
    line-protocol string ``measurement,tag=v field=v[,field=v] ts``.

    ``tags``/``fields`` are ordered (key, value-column) lists — tag order
    is caller-declared like the CEF extension order. Numeric field values
    are emitted as-is (double formatting), long columns get the ``i``
    suffix, booleans become ``t``/``f``; identifiers are escaped. Pure
    JVM string expressions; round-trips through :func:`parse_influxdb`
    (property-tested).

    Field VALUES are pre-formatted strings — use the ``ilp_field_*``
    helpers (``42i`` ints, ``t``/``f`` bools, quoted-escaped strings) so
    the wire type is explicit at the call site, exactly like the
    reference sink's typed field encoding."""
    parts = [_ilp_escape(measurement.cast("string"))]
    for k, v in tags:
        parts.append(
            F.concat(
                F.lit(","), F.lit(k.replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")),
                F.lit("="), _ilp_escape(v.cast("string")),
            )
        )

    fparts = []
    for i, (k, v) in enumerate(fields):
        key = F.lit(("," if i else "") + k.replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=") + "=")
        fparts.append(F.concat(key, v))
    line = F.concat(*parts, F.lit(" "), *fparts)
    if ts_ns is not None:
        line = F.concat(line, F.lit(" "), ts_ns.cast("string"))
    return line


def ilp_field_int(v: Column) -> Column:
    """Format an integer column as an ILP int field value (``42i``)."""
    return F.concat(v.cast("long").cast("string"), F.lit("i"))


def ilp_field_float(v: Column) -> Column:
    """Format a float column as an ILP float field value."""
    return v.cast("double").cast("string")


def ilp_field_bool(v: Column) -> Column:
    """Format a boolean column as an ILP bool field value (``t``/``f``)."""
    return F.when(v, F.lit("t")).otherwise(F.lit("f"))


def ilp_field_str(v: Column) -> Column:
    """Format a string column as a quoted ILP string field value."""
    return F.concat(
        F.lit('"'),
        F.regexp_replace(
            F.regexp_replace(v, r"\\", r"\\\\"), r'"', r'\\"'
        ),
        F.lit('"'),
    )


# InfluxDB line protocol: measurement[,tag=v...] field=v[,field=v...] [ts]
# Escapes: `\,` `\ ` `\=` in identifiers; string field values are quoted.
_ILP_KEY = r"(?:\\.|[^=,\s\\])+"
_ILP_BOOL_TRUE = ("t", "T", "true", "True", "TRUE")
_ILP_BOOL_FALSE = ("f", "F", "false", "False", "FALSE")


def parse_influxdb(col: Column) -> Column:
    """parse_influxdb (InfluxDB line protocol) → ``array<struct(name,
    value double, tags map<string,string>, ts_ns long)>`` — one element
    per NUMERIC field, mirroring the reference decoder which emits one
    absolute gauge per field named ``{measurement}_{field}`` with i64/u64
    cast to f64, booleans → 1.0/0.0, and string fields dropped
    (lib/codecs/src/decoding/format/influxdb.rs:108-145). Missing
    timestamp → null ts_ns; unparseable line → empty array.

    Pure JVM regex (lookbehind splits on unescaped separators). Known
    divergence (documented): a raw double-quote inside a TAG value can
    confuse the string-field stripper — quotes in tags are pathological
    and rejected by most ILP writers anyway.
    """
    from vector_spark.functions.objects import let

    un = lambda c: F.regexp_replace(c, r"\\(.)", "$1")  # noqa: E731
    # string fields are never emitted — strip `k="..."` tokens up front so
    # quoted values containing spaces/commas can't break segment splits
    no_str = F.regexp_replace(
        col, r',' + _ILP_KEY + r'="(?:\\.|[^"\\])*"', ""
    )
    no_str = F.regexp_replace(
        no_str, _ILP_KEY + r'="(?:\\.|[^"\\])*",', ""
    )
    no_str = F.regexp_replace(
        no_str, r' ' + _ILP_KEY + r'="(?:\\.|[^"\\])*"', " "
    )
    def field_value(v: Column) -> Column:
        num = v.rlike(r"^-?[0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?$")
        intsuf = v.rlike(r"^-?[0-9]+[iu]$")
        return (
            F.when(intsuf, F.substring(v, 1, F.length(v) - 1).cast("double"))
            .when(num, v.cast("double"))
            .when(v.isin(*_ILP_BOOL_TRUE), F.lit(1.0))
            .when(v.isin(*_ILP_BOOL_FALSE), F.lit(0.0))
        )

    # Two nested let-bindings: (1) the segment split — measurement, tags,
    # ts and fields all derive from it, and as free subtrees each would
    # re-run the string-strip + lookbehind split per reference (measured
    # ~6× the regex work per row); (2) the parsed series-level values, so
    # the per-field lambda doesn't re-run the tag regexes per field.
    def from_parts(parts: Column) -> Column:
        series = F.get(parts, 0)
        fields_seg = F.get(parts, 1)
        ts_ns = F.get(parts, 2).try_cast("long")  # null when absent
        measurement = un(F.regexp_extract(series, r"^((?:\\.|[^,\\])+)", 1))
        tag_tokens = F.filter(
            F.split(
                F.regexp_replace(series, r"^(?:\\.|[^,\\])+", ""),
                r"(?<!\\),",
            ),
            lambda t: t != "",
        )
        tags = F.map_from_entries(
            F.transform(
                tag_tokens,
                lambda t: F.struct(
                    un(F.regexp_extract(t, r"^(" + _ILP_KEY + r")=", 1)),
                    un(F.regexp_replace(t, r"^" + _ILP_KEY + r"=", "")),
                ),
            )
        )
        # a token must be `key=...` — guards against the trailing
        # timestamp sliding into the field segment when every field was a
        # stripped string
        field_tokens = F.filter(
            F.split(fields_seg, r"(?<!\\),"),
            lambda t: t.rlike(r"^" + _ILP_KEY + r"="),
        )
        return let(
            F.struct(
                measurement.alias("m"),
                tags.alias("tg"),
                ts_ns.alias("ts"),
                field_tokens.alias("fts"),
            ),
            lambda b: F.filter(
                F.transform(
                    b["fts"],
                    lambda t: F.struct(
                        F.concat_ws(
                            "_",
                            b["m"],
                            un(
                                F.regexp_extract(
                                    t, r"^(" + _ILP_KEY + r")=", 1
                                )
                            ),
                        ).alias("name"),
                        field_value(
                            F.regexp_replace(t, r"^" + _ILP_KEY + r"=", "")
                        ).alias("value"),
                        b["tg"].alias("tags"),
                        b["ts"].alias("ts_ns"),
                    ),
                ),
                lambda s: s["value"].isNotNull(),
            ),
        )

    return let(F.split(no_str, r"(?<!\\) +"), from_parts)


def uuid_v7(ts: Column, entropy: Column) -> Column:
    """uuid_v7 (VRL uuid_v7.cue): RFC 9562 layout — 48-bit unix-millis
    timestamp, version nibble 7, variant bits 10. The 74 "random" bits are
    derived from md5(entropy) instead of a CSPRNG so the id is DETERMINISTIC
    per (ts, entropy) — reproducible across retries/reruns (the same
    portability trade documented for keyed sampling, SURVEY §7.1) and
    reproducible by any engine with md5.

    Layout: tttttttt-tttt-7rrr-vrrr-rrrrrrrrrrrr
    """
    # TIMESTAMP_NTZ needs an explicit TIMESTAMP hop (session tz is UTC)
    ms = F.unix_millis(ts.cast("timestamp"))
    t_hex = F.lpad(F.lower(F.hex(ms)), 12, "0")
    r = F.md5(entropy.cast("string"))
    # variant digit: first two bits 10 → 8|9|a|b, from one md5 nibble % 4
    variant = F.lower(F.hex(F.conv(F.substring(r, 4, 1), 16, 10).cast("int") % 4 + 8))
    return F.concat_ws(
        "-",
        F.substring(t_hex, 1, 8),
        F.substring(t_hex, 9, 4),
        F.concat(F.lit("7"), F.substring(r, 1, 3)),
        F.concat(variant, F.substring(r, 5, 3)),
        F.substring(r, 8, 12),
    )


def _statsd_sanitize_key(key: Column) -> Column:
    """Reference key sanitization (src/sources/statsd/parser.rs:169-178),
    including its quirk of replacing ``/`` with ``'-``: whitespace runs →
    ``_``, then every char outside ``[a-zA-Z_\\-0-9.]`` is dropped."""
    s = F.replace(key, F.lit("/"), F.lit("'-"))
    s = F.regexp_replace(s, r"\s+", "_")
    return F.regexp_replace(s, r"[^a-zA-Z_\-0-9\.]", "")


def parse_statsd(col: Column, sanitize_keys: bool = True) -> Column:
    """statsd/dogstatsd datagram → typed metric struct; malformed → null.

    Mirrors the reference parser (src/sources/statsd/parser.rs:30-125):
    ``<key>:<value>|<type>[|@<rate>][|#<tags>]`` with types
    c (counter, value scaled by 1/rate), g (gauge; leading +/- makes it
    an incremental delta, otherwise absolute), ms/h (histogram samples —
    ms converted to base seconds), d (summary sample), s (set). A
    position-3 component not starting with ``@`` and a tags component not
    starting with ``#`` are ignored, not errors (reference behavior).
    Tags keep dogstatsd semantics: ``k:v`` pairs, bare tags map to null.

    Struct: (name, metric_type counter|gauge|distribution|set,
    kind absolute|incremental, value, set_value, sample_rate, statistic
    histogram|summary, tags map<string,string>).
    """
    from vector_spark.functions.objects import let

    def from_parts(kv: Column) -> Column:
        key = F.element_at(kv, 1)
        body = F.try_element_at(kv, F.lit(2))
        return let(F.split(body, r"\|"), lambda parts: _statsd_body(key, parts, sanitize_keys))

    return let(F.split(col, ":", 2), from_parts)


def _statsd_body(key: Column, parts: Column, sanitize_keys: bool) -> Column:
    val_str = F.try_element_at(parts, F.lit(1))
    mtype = F.try_element_at(parts, F.lit(2))
    p3 = F.try_element_at(parts, F.lit(3))
    p4 = F.try_element_at(parts, F.lit(4))

    has_sampling = p3.isNotNull() & p3.startswith("@")
    raw_rate = F.substring(p3, 2, 2_000_000).try_cast("double")
    # reference: rate 0 sanitized to 1; negative rate is an error
    rate = F.when(raw_rate == 0.0, F.lit(1.0)).otherwise(raw_rate)
    mult = F.when(has_sampling, 1.0 / rate).otherwise(F.lit(1.0))
    bad_rate = has_sampling & (raw_rate.isNull() | (raw_rate < 0))

    tags_part = F.when(has_sampling, p4).otherwise(p3)
    tags = F.when(
        tags_part.isNotNull() & tags_part.startswith("#"),
        F.str_to_map(
            F.substring(tags_part, 2, 2_000_000), F.lit(","), F.lit(":")
        ),
    )

    num = val_str.try_cast("double")
    first = F.substring(val_str, 1, 1)
    g_signed = first.isin("+", "-")
    g_num = (
        F.when(g_signed, F.substring(val_str, 2, 2_000_000))
        .otherwise(val_str)
        .try_cast("double")
    )

    name = _statsd_sanitize_key(key) if sanitize_keys else key
    mk = lambda metric_type, kind, value, set_value, stat: F.struct(  # noqa: E731
        name.alias("name"),
        F.lit(metric_type).alias("metric_type"),
        F.lit(kind).alias("kind"),
        value.alias("value"),
        set_value.alias("set_value"),
        F.when(has_sampling, rate).otherwise(F.lit(1.0)).alias("sample_rate"),
        stat.alias("statistic"),
        tags.alias("tags"),
    )
    snull = F.lit(None).cast("string")
    dnull = F.lit(None).cast("double")

    out = (
        F.when(mtype == "c", mk("counter", "incremental", num * mult, snull, snull))
        .when(
            mtype.isin("ms", "h", "d"),
            mk(
                "distribution",
                "incremental",
                F.when(mtype == "ms", num / 1000.0).otherwise(num),
                snull,
                F.when(mtype == "d", F.lit("summary")).otherwise(
                    F.lit("histogram")
                ),
            ),
        )
        .when(
            mtype == "g",
            F.when(
                g_signed,
                mk(
                    "gauge",
                    "incremental",
                    F.when(first == "-", -g_num).otherwise(g_num),
                    snull,
                    snull,
                ),
            ).otherwise(mk("gauge", "absolute", g_num, snull, snull)),
        )
        .when(mtype == "s", mk("set", "incremental", dnull, val_str, snull))
    )
    # malformed: no ':' (body null), <2 body parts, unknown type (falls
    # through the when-chain), unparseable value, negative/garbage rate,
    # gauge not starting with digit/+/-
    valid_value = (
        F.when(mtype == "g", g_num.isNotNull() & (g_signed | first.rlike(r"^[0-9]$")))
        .when(mtype == "s", val_str.isNotNull())
        .otherwise(num.isNotNull())
    )
    return F.when(
        mtype.isNotNull() & valid_value & ~bad_rate, out
    )


def _statsd_num(v: Column) -> Column:
    """Rust ``Display``-style float formatting: integral values print with
    no fraction (``1`` not ``1.0``), everything else via the double's
    shortest round-trip repr."""
    return F.when(
        v == F.floor(v), v.cast("long").cast("string")
    ).otherwise(v.cast("string"))


def encode_statsd(
    name: Column,
    metric_type: Column,
    kind: Column,
    value: Column,
    set_value: Column,
    sample_rate: Column,
    statistic: Column,
    tags: Column,
) -> Column:
    """Metric struct fields → statsd datagram (reference statsd sink,
    src/sinks/statsd/encoder.rs:45-155): ``name:value|type[|@rate][|#tags]``
    — incremental gauges print an explicit sign, the rate component is
    omitted when 1, tags are sorted by key with bare tags as the key alone.
    One sample per row (our distribution model), so one line per metric.
    Inverse of :func:`parse_statsd` for sanitized names (round-trip
    tested)."""
    tchar = (
        F.when(metric_type == "counter", F.lit("c"))
        .when(metric_type == "gauge", F.lit("g"))
        .when(metric_type == "set", F.lit("s"))
        .when(
            metric_type == "distribution",
            F.when(statistic == "summary", F.lit("d")).otherwise(F.lit("h")),
        )
    )
    signed = F.when(
        value >= 0, F.concat(F.lit("+"), _statsd_num(value))
    ).otherwise(_statsd_num(value))
    val = (
        F.when(metric_type == "set", set_value)
        .when(
            (metric_type == "gauge") & (kind == "incremental"), signed
        )
        .otherwise(_statsd_num(value))
    )
    # the reference writes the sampling component only for distributions
    # (counter values are already 1/rate-scaled at parse; encoder.rs:52-67
    # passes None for counter/gauge/set)
    rate = F.when(
        (metric_type == "distribution")
        & sample_rate.isNotNull()
        & (sample_rate != 1.0),
        F.concat(F.lit("|@"), _statsd_num(sample_rate)),
    ).otherwise(F.lit(""))
    entries = F.sort_array(F.map_entries(tags))
    tag_str = F.array_join(
        F.transform(
            entries,
            lambda e: F.when(e["value"].isNull(), e["key"]).otherwise(
                F.concat(e["key"], F.lit(":"), e["value"])
            ),
        ),
        ",",
    )
    tag_part = F.when(
        tags.isNotNull() & (F.size(F.map_keys(tags)) > 0),
        F.concat(F.lit("|#"), tag_str),
    ).otherwise(F.lit(""))
    return F.concat(name, F.lit(":"), val, F.lit("|"), tchar, rate, tag_part)


def encode_statsd_struct(m: Column) -> Column:
    """``encode_statsd`` over a :func:`parse_statsd`-shaped struct."""
    return encode_statsd(
        m["name"], m["metric_type"], m["kind"], m["value"], m["set_value"],
        m["sample_rate"], m["statistic"], m["tags"],
    )
