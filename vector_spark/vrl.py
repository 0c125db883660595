"""VRL program front-end: compile a VRL-subset *program* to remap inputs.

The reference's remap transform takes a VRL source program
(src/transforms/remap.rs:100-118); conditions.py already compiles VRL
*predicates*. This module compiles the statement language — assignments,
``del``, ``if/else``, ``abort`` — by **symbolic evaluation**: statements are
walked in order while an environment maps each event field to a Column
expression OVER THE ORIGINAL INPUT COLUMNS. Sequential VRL semantics
(``.a = .a + 1; .b = .a * 2`` sees the NEW ``.a``) are preserved by
substitution at compile time, so the emitted assignments are
order-independent and are applied in ONE projection (remap's
``simultaneous`` mode) — no chained withColumn, no Python in the hot path.

Fallibility (VRL's ``!`` suffix, e.g. ``string!(.f)``): a fallible-asserted
call that yields NULL at runtime terminates the program with an error, so
the compiler derives ``error_when`` = OR over ``(guard AND result IS NULL)``
for every ``!`` call — the vectorized twin of VRL's runtime abort.
``expr ?? fallback`` compiles to ``coalesce`` and clears the left side's
collected fallibility (the error is handled, remap.rs:554-575).

``abort`` (guarded by its enclosing ``if`` chain) accumulates into
``abort_when``; remap's revert machinery makes any assignments on the
aborted path moot, exactly like the reference forwarding ``original_event``.

Subset grammar::

    program := stmt*
    stmt    := path "=" expr | "del" "(" path ")" | "abort"
             | "if" expr block ("else" ("if" expr block | block))?
    expr    := coalesce ; coalesce := or ("??" or)*
    or/and/cmp/add/mul/unary — usual precedence, ``!``/unary ``-``
    primary := path | literal | array | call | "(" expr ")"
              with postfix ".field" / "[i]" access
    call    := ident "!"? "(" (expr | ident ":" expr) ("," ...)* ")"

Closures (``fn(args) -> |p1, p2| { body }``) compile to Spark
higher-order functions: ``filter``/``map_keys``/``map_values`` expression
bodies become ``F.filter``/``F.transform_keys``/``F.transform_values``/
``F.transform`` lambdas over statically-typed array/map targets, and
``for_each`` statement bodies become ``F.aggregate`` with a struct
accumulator of the outer variables the body reassigns (see the closure
section in ``_Compiler`` for the documented deviations).

Dynamic paths ride ``get``/``set``/``remove`` with path arrays
(get.cue/set.cue/remove.cue): literal segments walk object-literal
fields at compile time or structs via getItem/withField/dropFields,
dynamic expression segments lower to ``element_at``/``map_filter``/
``map_concat`` on map-typed values.

Out of scope (loud ``VrlCompileError``, never silent): dynamic path
SYNTAX on the left of ``=`` (``.a[.k] = …`` — route through
``set``), ``.`` root assignment (use ``remap_explode``), recursive
closure iteration, dynamic-key object mutation inside closures,
functions absent from the registry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class VrlCompileError(ValueError):
    pass


# internal path-segment separator — lets quoted segments (`."d.e"`) carry
# literal dots without colliding with the nested-path separator
SEP = "\x1f"


# --- tokenizer ---------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*)
      | (?P<meta>%[A-Za-z_][A-Za-z0-9_.]*|%(?![A-Za-z_]))
      | (?P<op>\?\?|\|\||&&|==|!=|>=|<=|->|>|<|[=!(){}\[\],:;+\-*/%|])
      | (?P<path>\.[A-Za-z_][A-Za-z0-9_.]*|\.)
      | (?P<str>\"\"\"(?:[^\\]|\\.)*?\"\"\"|"(?:[^"\\]|\\.)*"|r'(?:[^'\\]|\\.)*'|'(?:[^'\\]|\\.)*')
      | (?P<num>\d+\.\d+|\d+)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*!?)
    )""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str, bool, int, int]]:
    """Tokens are ``(kind, value, newline_before, start, end)`` — VRL
    statements are newline-terminated, so postfix member access must not
    cross a newline (``f(.a)\\n.b = …`` is two statements, not ``f(.a).b``).
    ``start``/``end`` are byte offsets into the source, used to render the
    reference's ``at (start:end)`` spans in captured error messages
    (lib/vrl — diagnostic spans are 0-based byte ranges over the program)."""
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise VrlCompileError(f"bad VRL syntax at: {src[pos:pos + 40]!r}")
        nl = "\n" in src[pos : m.start(m.lastgroup)]
        pos = m.end()
        kind = m.lastgroup
        if kind != "comment":
            out.append((kind, m.group(kind), nl, m.start(kind), m.end()))
    out.append(("eof", "", True, len(src), len(src)))
    return out


class _BadJson(Exception):
    def __init__(self, msg: str, j: int, eof: bool = False):
        super().__init__(msg)
        self.msg, self.j, self.eof = msg, j, eof


def _serde_json_error(s: str) -> str | None:
    """serde_json-compatible error text for an invalid JSON document, or
    None when it parses. The reference's ``parse_json`` surfaces serde_json
    messages verbatim (``unable to parse json: key must be a string at
    line 1 column 3`` — remap.toml:311-326), so captured-error assignments
    reproduce the same strings: 1-based line, 1-based byte column of the
    offending character (EOF errors point one past the consumed input)."""
    n = len(s)

    def _pos(j: int, eof: bool = False) -> str:
        line = s.count("\n", 0, j) + 1
        last = s.rfind("\n", 0, j)
        col = (j - last - 1) if eof else (j - last)
        return f"at line {line} column {col}"

    def _ws(i: int) -> int:
        while i < n and s[i] in " \t\n\r":
            i += 1
        return i

    def _string(i: int) -> int:  # i at opening quote
        i += 1
        while True:
            if i >= n:
                raise _BadJson("EOF while parsing a string", n, eof=True)
            c = s[i]
            if c == '"':
                return i + 1
            if ord(c) < 0x20:
                raise _BadJson(
                    "control character (\\u0000-\\u001F) "
                    "found while parsing a string",
                    i,
                )
            if c == "\\":
                if i + 1 >= n:
                    raise _BadJson("EOF while parsing a string", n, eof=True)
                e = s[i + 1]
                if e == "u":
                    if i + 5 >= n:
                        raise _BadJson(
                            "EOF while parsing a string", n, eof=True
                        )
                    if not all(
                        ch in "0123456789abcdefABCDEF" for ch in s[i + 2 : i + 6]
                    ):
                        raise _BadJson("invalid escape", i + 2)
                    i += 6
                    continue
                if e not in '"\\/bfnrt':
                    raise _BadJson("invalid escape", i + 1)
                i += 2
                continue
            i += 1

    def _number(i: int) -> int:
        m = re.match(r"-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?", s[i:])
        if not m or not re.match(r"-?\d", s[i : i + 2]):
            raise _BadJson("invalid number", i + (1 if s[i] == "-" else 0))
        return i + m.end()

    def _value(i: int) -> int:
        i = _ws(i)
        if i >= n:
            raise _BadJson("EOF while parsing a value", n, eof=True)
        c = s[i]
        if c == "{":
            return _object(i)
        if c == "[":
            return _array(i)
        if c == '"':
            return _string(i)
        if c == "-" or c.isdigit():
            return _number(i)
        for kw in ("true", "false", "null"):
            if s.startswith(kw, i):
                return i + len(kw)
        raise _BadJson("expected value", i)

    def _object(i: int) -> int:  # i at '{'
        i = _ws(i + 1)
        if i >= n:
            raise _BadJson("EOF while parsing an object", n, eof=True)
        if s[i] == "}":
            return i + 1
        while True:
            if s[i] != '"':
                raise _BadJson("key must be a string", i)
            i = _ws(_string(i))
            if i >= n:
                raise _BadJson("EOF while parsing an object", n, eof=True)
            if s[i] != ":":
                raise _BadJson("expected `:`", i)
            i = _ws(_value(i + 1))
            if i >= n:
                raise _BadJson("EOF while parsing an object", n, eof=True)
            if s[i] == "}":
                return i + 1
            if s[i] != ",":
                raise _BadJson("expected `,` or `}`", i)
            i = _ws(i + 1)
            if i >= n:
                raise _BadJson("EOF while parsing an object", n, eof=True)
            if s[i] == "}":
                raise _BadJson("trailing comma", i)

    def _array(i: int) -> int:  # i at '['
        i = _ws(i + 1)
        if i >= n:
            raise _BadJson("EOF while parsing a list", n, eof=True)
        if s[i] == "]":
            return i + 1
        while True:
            i = _ws(_value(i))
            if i >= n:
                raise _BadJson("EOF while parsing a list", n, eof=True)
            if s[i] == "]":
                return i + 1
            if s[i] != ",":
                raise _BadJson("expected `,` or `]`", i)
            i = _ws(i + 1)
            if i >= n:
                raise _BadJson("EOF while parsing a list", n, eof=True)
            if s[i] == "]":
                raise _BadJson("trailing comma", i)

    try:
        i = _ws(_value(0))
        if i < n:
            raise _BadJson("trailing characters", i)
        return None
    except _BadJson as e:
        return f"{e.msg} {_pos(e.j, e.eof)}"


def _unquote(tok: str) -> str:
    if tok.startswith('"""'):
        body = tok[3:-3]
    elif tok.startswith("r'"):
        return tok[2:-1]  # raw string: no escape processing
    else:
        body = tok[1:-1]
    return (
        body.replace(r"\n", "\n")
        .replace(r"\t", "\t")
        .replace(r"\"", '"')
        .replace(r"\'", "'")
        .replace("\\\\", "\\")
    )


# --- values: a Column plus (when statically known) the python literal --------


@dataclass
class _Val:
    col: Column
    lit: object = None
    has_lit: bool = False
    fallible: list[Column] = field(default_factory=list)
    is_str: bool = False  # statically known to be a string (for `+` concat)
    is_regex: bool = False  # came from a VRL regex literal r'…'
    is_null_lit: bool = False  # the `null` keyword itself
    is_ts: bool = False  # statically known to be a timestamp
    is_variant: bool = False  # dynamic JSON (Spark VariantType)
    is_num: bool = False  # came out of arithmetic (error default = 0.0)
    err_msg: Column | None = None  # reference-style error text for a
    # statically-known failure, surfaced by `.x, .err = f(…)` capture
    elem_variant: bool = False  # a map/array whose VALUES are variants
    dtype: str | None = None  # known Spark dtype (direct column reads)
    is_obj: bool = False  # an object literal (compares via JSON rendering)
    fields: dict | None = None  # object literal's per-field _Vals
    items: list | None = None  # array literal's per-element _Vals (lets
    # get/set/remove walk dynamic path arrays segment by segment)


def _v(x: _Val) -> object:
    if not x.has_lit:
        raise VrlCompileError(
            "this argument must be a literal (the Spark builder needs a "
            "plan-time constant, e.g. a format string or regex)"
        )
    return x.lit


def _lit(value: object) -> _Val:
    return _Val(F.lit(value), value, True, is_str=isinstance(value, str))


# VRL functions statically known to return strings — `+` on these concats
_STR_FUNCS = {
    "string", "to_string", "upcase", "downcase", "snakecase", "camelcase",
    "pascalcase", "kebabcase", "screamingsnakecase", "strip_whitespace",
    "strip_ansi_escape_codes", "truncate", "slice", "replace", "redact",
    "sieve", "join", "md5", "sha1", "sha2", "sha3", "hmac", "encode_base64",
    "encode_base16", "encode_json", "format_timestamp", "uuid_v4", "uuid_v7",
    "ip_subnet", "ip_ntoa", "ip_to_ipv6", "ipv6_to_ipv4",
    "to_syslog_facility", "to_syslog_level", "get_hostname",
    "get_timezone_name",
}

# VRL functions statically known to return timestamps (drives to_string's
# RFC 3339 rendering on a typed engine)
_TS_FUNCS = {"now", "parse_timestamp", "from_unix_timestamp", "timestamp"}

# positional parameter names per VRL function (functions/*.cue argument
# order) — lets named args fill their positional slots
_ARG_ORDER = {
    "contains": ("value", "substring", "case_sensitive"),
    "starts_with": ("value", "substring", "case_sensitive"),
    "ends_with": ("value", "substring", "case_sensitive"),
    "slice": ("value", "start", "end"),
    "replace": ("value", "pattern", "with", "count"),
    "split": ("value", "pattern", "limit"),
    "join": ("value", "separator"),
    "ip_cidr_contains": ("cidr", "value"),
    "match": ("value", "pattern"),
    "find": ("value", "pattern"),
}


# --- strftime → java SimpleDateFormat (for parse/format_timestamp) -----------

_STRF = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS",
    "%3f": "SSS", "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%p": "a", "%z": "xx", "%:z": "xxx", "%Z": "zzz", "%j": "DDD",
    "%T": "HH:mm:ss", "%F": "yyyy-MM-dd", "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate the chrono/strftime directives VRL uses to Spark's
    java.time pattern letters. Literal ASCII letters must be quoted in
    java.time patterns (e.g. the 'T' in ISO timestamps)."""
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            for width in (3, 2):
                d = fmt[i : i + width]
                if d in _STRF:
                    out.append(_STRF[d])
                    i += width
                    break
            else:
                raise VrlCompileError(f"unsupported strftime directive {fmt[i:i+2]!r}")
        elif fmt[i].isalpha():
            out.append(f"'{fmt[i]}'")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


# --- function registry --------------------------------------------------------
# Each entry: callable(args: list[_Val], kwargs: dict[str, _Val]) -> Column.
# Built lazily (no Columns at import time). Names match VRL stdlib
# (website/cue/reference/remap/functions/*.cue); implementations come from
# vector_spark.functions — the same code the rest of the engine uses.


def _registry():
    from vector_spark.functions import crypto, ip, objects, parse, strings, syslog

    def _assert_string(v: _Val) -> Column:
        if v.dtype is not None and v.dtype not in ("string", "variant"):
            raise VrlCompileError(
                f"string!() on a column of type {v.dtype!r} can never succeed"
            )
        return _render(v)

    def _render(v: _Val) -> Column:
        # VRL renders timestamps as RFC 3339 with a Z; Spark's string cast
        # uses "yyyy-MM-dd HH:mm:ss" — branch on static type knowledge
        if v.is_ts:
            return F.date_format(v.col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        return v.col.cast("string")

    def parse_syslog_vrl(a, k):
        # the engine struct keeps numeric facility/severity (gate oracles
        # depend on it); VRL's shape uses keywords (parse_syslog.cue)
        s = parse.parse_syslog(a[0].col)
        return F.struct(
            syslog.to_syslog_facility(s["facility"]).alias("facility"),
            syslog.to_syslog_level(s["severity"]).alias("severity"),
            s["version"].alias("version"),
            s["timestamp"].alias("timestamp"),
            s["hostname"].alias("hostname"),
            s["appname"].alias("appname"),
            s["procid"].cast("long").alias("procid"),
            s["msgid"].alias("msgid"),
            s["structured_data"].alias("structured_data"),
            s["message"].alias("message"),
        )

    def parse_clf_vrl(a, k):
        # VRL's default timestamp_format IS the CLF layout
        fmt = (
            strftime_to_java(_v(a[1]))
            if len(a) > 1
            else "dd/MMM/yyyy:HH:mm:ss xx"
        )
        s = parse.parse_common_log(a[0].col, fmt)
        return F.struct(
            s["host"].alias("host"),
            s["ident"].alias("identity"),
            s["user"].alias("user"),
            s["timestamp"].alias("timestamp"),
            F.concat_ws(" ", s["method"], s["path"], s["protocol"]).alias(
                "message"
            ),
            s["method"].alias("method"),
            s["path"].alias("path"),
            s["protocol"].alias("protocol"),
            s["status"].cast("long").alias("status"),
            s["bytes"].alias("size"),
        )

    def parse_glog_vrl(a, k):
        # VRL shape (parse_glog.cue): level/timestamp/id/file/line/message;
        # 8-digit dates carry the year, 4-digit dates use the current year
        s = parse.parse_glog(a[0].col)
        d = s["mmdd"]
        year = F.when(F.length(d) == 8, F.substring(d, 1, 4)).otherwise(
            F.year(F.current_date()).cast("string")
        )
        md = F.when(F.length(d) == 8, F.substring(d, 5, 4)).otherwise(d)
        ts = F.to_timestamp(
            F.concat_ws(
                " ",
                F.concat_ws(
                    "-", year, F.substring(md, 1, 2), F.substring(md, 3, 2)
                ),
                s["time"],
            )
        )
        return F.struct(
            s["level"].alias("level"),
            ts.alias("timestamp"),
            s["thread_id"].alias("id"),
            s["file"].alias("file"),
            s["line"].cast("long").alias("line"),
            s["message"].alias("message"),
        )

    def format_number(a, k):
        # VRL format_number TRUNCATES to scale, then formats with custom
        # separators (format_number.cue)
        scale = _v(k["scale"]) if "scale" in k else (_v(a[1]) if len(a) > 1 else 0)
        dec = _v(k["decimal_separator"]) if "decimal_separator" in k else "."
        grp = _v(k["grouping_separator"]) if "grouping_separator" in k else ","
        c = a[0].col.cast("double")
        truncated = F.floor(c * (10**scale)) / (10**scale)
        base = F.format_number(truncated, scale)  # "1,234.56"
        return F.translate(base, ",.", grp + dec)

    def _arr(v: _Val) -> Column:
        return v.col.try_cast("array<string>") if v.is_variant else v.col

    def _is_type(v: _Val, variant_prefix: str, dtypes: tuple[str, ...]) -> Column:
        if v.is_variant:
            pat = "^(" + variant_prefix + ")"
            return F.coalesce(
                F.schema_of_variant(v.col).rlike(pat), F.lit(False)
            )
        if v.is_ts:
            return F.lit("timestamp" in dtypes)
        if v.is_str:
            return F.lit("string" in dtypes) & v.col.isNotNull()
        if v.dtype is not None:
            base = v.dtype.split("<")[0]
            return F.lit(base in dtypes) & v.col.isNotNull()
        if v.has_lit:
            t = {bool: "boolean", int: "bigint", float: "double", str: "string"}.get(
                type(v.lit)
            )
            return F.lit(t in dtypes)
        # unknown static type: conservative false is worse than a null
        # check — report based on non-nullness only when types match later
        raise VrlCompileError(
            "is_* type check needs a statically-typed or variant argument"
        )

    def flatten_fn(a, k):
        # flatten (flatten.cue): arrays flatten recursively; objects get
        # one level of dotted keys. Variants re-unify through a JSON
        # round-trip — arrays by bracket-stripping the rendering (full
        # depth), objects by an entries recomposition (one level)
        v = a[0]
        if not v.is_variant:
            return F.flatten(v.col)
        arr = v.col.try_cast("array<variant>")
        mp = v.col.try_cast("map<string,variant>")
        arr_txt = F.concat(
            F.lit("["),
            F.regexp_replace(
                F.regexp_replace(F.to_json(arr), r"[\[\]]", ""), r"^,+|,+$", ""
            ),
            F.lit("]"),
        )

        def dot(e):
            sub = e["value"].try_cast("map<string,variant>")
            return F.when(
                sub.isNotNull(),
                F.transform(
                    F.map_entries(sub),
                    lambda i: F.struct(
                        F.concat(e["key"], F.lit("."), i["key"]).alias("key"),
                        i["value"].alias("value"),
                    ),
                ),
            ).otherwise(F.array(e))

        map_txt = F.to_json(
            F.map_from_entries(F.flatten(F.transform(F.map_entries(mp), dot)))
        )
        txt = F.when(arr.isNotNull(), arr_txt).otherwise(map_txt)
        return _Val(F.try_parse_json(txt), is_variant=True)

    def _path_segs(p: _Val) -> list[_Val]:
        """get/set/remove path argument → per-segment _Vals. Literal
        arrays keep their python values; dynamic arrays keep their
        element expressions (vrl.py array-literal `items`)."""
        if p.items is not None:
            return p.items
        if p.has_lit and isinstance(p.lit, list):
            return [_lit(x) for x in p.lit]
        raise VrlCompileError(
            'get/set/remove need a path ARRAY (e.g. ["a", "b"]; dynamic '
            "expression segments are allowed on map-typed values)"
        )

    def get_fn(a, k):
        # get.cue: read a value at a path, null on a miss — dynamic-path
        # reads. Literal string segments walk object-literal fields at
        # compile time or structs/maps via getItem; dynamic segments
        # lower to element_at (maps; arrays are 1-based there, so VRL's
        # 0-based literal int indices shift by one).
        cur = a[0]
        for seg in _path_segs(a[1]):
            if (
                seg.has_lit and isinstance(seg.lit, str)
                and cur.is_obj and cur.fields is not None
            ):
                got = cur.fields.get(seg.lit)
                cur = got if got is not None else _Val(
                    F.lit(None), is_null_lit=True
                )
                continue
            if seg.has_lit and isinstance(seg.lit, str):
                cur = _Val(cur.col.getItem(seg.lit))
            elif seg.has_lit and isinstance(seg.lit, int):
                # VRL 0-based from the front, -1-based from the end
                # (get.cue examples); element_at is 1-based but indexes
                # from the end natively for negative i, so only
                # non-negative indices shift
                i = int(seg.lit)
                cur = _Val(F.element_at(cur.col, i + 1 if i >= 0 else i))
            else:
                cur = _Val(F.element_at(cur.col, seg.col.cast("string")))
        return cur

    def _is_map(v: _Val) -> bool:
        return (v.dtype or "").replace(" ", "").startswith("map")

    def set_fn(a, k):
        # set.cue: return the value with `data` written at the path.
        # Map values update per key (dynamic keys allowed); struct
        # values use nested withField on an all-literal path.
        tgt, p, data = a[0], a[1], a[2]
        segs = _path_segs(p)
        if _is_map(tgt):
            if len(segs) != 1:
                raise VrlCompileError("set on a map takes a 1-segment path")
            key = segs[0].col.cast("string")
            updated = F.map_concat(
                F.map_filter(tgt.col, lambda mk, mv: mk != key),
                F.map_from_arrays(F.array(key), F.array(data.col)),
            )
            return _Val(updated, dtype=tgt.dtype)
        if all(s.has_lit and isinstance(s.lit, str) for s in segs):
            dotted = ".".join(
                s.lit.replace("`", "") for s in segs
            )
            return _Val(tgt.col.withField(dotted, data.col), is_obj=True)
        raise VrlCompileError(
            "set needs a map-typed value (dynamic key) or an all-literal "
            "path on a struct"
        )

    def remove_fn(a, k):
        # remove.cue: return the value with the path deleted
        tgt, p = a[0], a[1]
        segs = _path_segs(p)
        if _is_map(tgt):
            if len(segs) != 1:
                raise VrlCompileError(
                    "remove on a map takes a 1-segment path"
                )
            key = segs[0].col.cast("string")
            return _Val(
                F.map_filter(tgt.col, lambda mk, mv: mk != key),
                dtype=tgt.dtype,
            )
        if all(s.has_lit and isinstance(s.lit, str) for s in segs):
            dotted = ".".join(s.lit.replace("`", "") for s in segs)
            return _Val(tgt.col.dropFields(dotted), is_obj=True)
        raise VrlCompileError(
            "remove needs a map-typed value (dynamic key) or an "
            "all-literal path on a struct"
        )

    def merge(a, k):
        # shallow merge, right wins (merge.cue; `deep` nested structures
        # come back as variant values and merge shallowly here)
        if a[0].is_variant or a[1].is_variant:
            return _Val(
                F.map_concat(
                    a[0].col.try_cast("map<string,variant>"),
                    a[1].col.try_cast("map<string,variant>"),
                ),
                elem_variant=True,
            )
        return objects.merge_maps(a[0].col, a[1].col)

    def compact(a, k):
        # drops null, "" and empty collections (compact.cue); a variant
        # input may be array OR object — filter each form and re-variant
        # through a JSON round-trip so both branches share one type
        if not a[0].is_variant:
            return F.filter(a[0].col, lambda x: x.isNotNull())
        keep = lambda x: x.isNotNull() & ~x.cast("string").isin("", "[]", "{}")  # noqa: E731
        arr = a[0].col.try_cast("array<variant>")
        mp = a[0].col.try_cast("map<string,variant>")
        txt = F.when(arr.isNotNull(), F.to_json(F.filter(arr, keep))).otherwise(
            F.to_json(F.map_filter(mp, lambda _, x: keep(x)))
        )
        # compact is RECURSIVE (compact.cue): strip nullish object entries
        # at depth via the JSON text (3 passes cover nesting the corpus and
        # any sane pipeline config uses)
        nullish = r'(null|""|\[\]|\{\})'
        for _ in range(3):
            txt = F.regexp_replace(txt, r',\s*"[^"]+":' + nullish, "")
            txt = F.regexp_replace(txt, r'"[^"]+":' + nullish + r"\s*,", "")
            txt = F.regexp_replace(txt, r'"[^"]+":' + nullish, "")
        return _Val(F.try_parse_json(txt), is_variant=True)

    def parse_regex_vrl(a, k):
        raw = _v(a[1])
        anon = re.sub(r"\(\?P<\w+>", "(", raw)
        names = (
            _v(k["fields"])
            if "fields" in k
            else re.findall(r"\(\?P<(\w+)>", raw)
        )
        fields = [
            F.nullif(F.regexp_extract(a[0].col, anon, i + 1), F.lit("")).alias(n)
            for i, n in enumerate(names)
        ]
        if "numeric_groups" in k and _v(k["numeric_groups"]):
            fields.append(F.regexp_extract(a[0].col, anon, 0).alias("0"))
            fields += [
                F.nullif(
                    F.regexp_extract(a[0].col, anon, i + 1), F.lit("")
                ).alias(str(i + 1))
                for i in range(len(names))
            ]
        return F.struct(*fields)

    def parse_regex_all_vrl(a, k):
        # every match → one object of named (+ optional numeric) groups:
        # per-group regexp_extract_all arrays zipped into array<struct>
        raw = _v(a[1])
        anon = re.sub(r"\(\?P<\w+>", "(", raw)
        names = re.findall(r"\(\?P<(\w+)>", raw)
        cols = [
            F.regexp_extract_all(a[0].col, F.lit(anon), i + 1).alias(n)
            for i, n in enumerate(names)
        ]
        if "numeric_groups" in k and _v(k["numeric_groups"]):
            cols.append(
                F.regexp_extract_all(a[0].col, F.lit(anon), 0).alias("0")
            )
            cols += [
                F.regexp_extract_all(a[0].col, F.lit(anon), i + 1).alias(
                    str(i + 1)
                )
                for i in range(len(names))
            ]
        return F.arrays_zip(*cols)

    def _affix(fn, a: list[_Val]) -> Column:
        # starts_with/ends_with: dynamic substring allowed; optional
        # case_sensitive third arg
        s, sub = a[0].col, a[1].col
        if len(a) > 2 and not _v(a[2]):
            s, sub = F.lower(s), F.lower(sub)
        return fn(s.cast("string"), sub.cast("string"))

    def is_nullish(a, k):
        # VRL is_nullish: null, "", "-", whitespace-only incl. \n \t \r
        # (is_nullish.cue) — F.trim only strips ASCII spaces, so regex
        c = a[0].col
        s = c.cast("string")
        return c.isNull() | s.rlike(r"^\s*$") | (s == "-")

    def parse_ts(a, k):
        fmt = k.get("format") or (a[1] if len(a) > 1 else None)
        s = _v(fmt) if fmt is not None else None
        if s == "%+":  # chrono RFC 3339 — Spark's default ISO parser
            return F.to_timestamp(a[0].col)
        if s == "%s":  # epoch seconds
            return F.timestamp_seconds(a[0].col.try_cast("long"))
        return parse.parse_timestamp(a[0].col, strftime_to_java(s) if s else None)

    def format_ts(a, k):
        fmt = _v(k.get("format") or a[1])
        if fmt == "%+":
            return F.date_format(a[0].col, "yyyy-MM-dd'T'HH:mm:ssxxx")
        if fmt == "%s":
            return F.unix_timestamp(a[0].col).cast("string")
        return F.date_format(a[0].col, strftime_to_java(fmt))

    def to_unix(a, k):
        unit = _v(k["unit"]) if "unit" in k else (_v(a[1]) if len(a) > 1 else "seconds")
        secs = F.unix_timestamp(a[0].col.cast("timestamp"))
        scale = {"seconds": 1, "milliseconds": 1_000, "nanoseconds": 1_000_000_000}[unit]
        return (secs * F.lit(scale)).cast("long")

    def slice_(a, k):
        end = _v(a[2]) if len(a) > 2 else (_v(k["end"]) if "end" in k else None)
        return strings.slice_(a[0].col, _v(a[1]), end)

    def redact(a, k):
        pats = _v(k["filters"]) if "filters" in k else _v(a[1])
        return strings.redact(a[0].col, list(pats))

    def trunc(a, k):
        limit = _v(k["limit"]) if "limit" in k else _v(a[1])
        suffix = _v(k["suffix"]) if "suffix" in k else ""
        if suffix is True:  # legacy `ellipsis: true` shape
            suffix = "..."
        return strings.truncate(a[0].col, limit, suffix or "")

    def repl(a, k):
        pat, rep = _v(a[1]), _v(a[2])
        literal = not a[1].is_regex
        count = _v(a[3]) if len(a) > 3 else (_v(k["count"]) if "count" in k else -1)
        if count == -1:
            return strings.replace(a[0].col, pat, rep, literal=literal)
        if count == 1 and literal:
            # first-occurrence replace: locate + overlay (no regexp count
            # support in Spark). overlay with a longer/shorter replacement
            # splices correctly.
            c = a[0].col
            loc = F.locate(pat, c)
            return F.when(
                loc > 0, F.overlay(c, F.lit(rep), loc, F.lit(len(pat)))
            ).otherwise(c)
        raise VrlCompileError("replace count other than 1/-1 unsupported")

    def parse_json(a, k):
        # open form → VariantType (dynamic JSON, Spark 4); pass a schema
        # for a typed struct instead
        if len(a) > 1 or "schema" in k:
            sch = _v(k["schema"]) if "schema" in k else _v(a[1])
            return parse.parse_json(a[0].col, sch)
        return F.try_parse_json(a[0].col.cast("string"))

    def ip_cidr(a, k):
        cidr = k["cidr"] if "cidr" in k else a[0]
        value = k["value"] if "value" in k else a[1]
        return ip.ip_cidr_contains(_v(cidr), value.col)

    def length(a, k):
        # VRL length works on strings, arrays and objects (length.cue);
        # for a variant, probe array → object → string at runtime
        if a[0].is_variant:
            arr = a[0].col.try_cast("array<variant>")
            mp = a[0].col.try_cast("map<string,variant>")
            return (
                F.when(arr.isNotNull(), F.size(arr))
                .when(mp.isNotNull(), F.size(mp))
                .otherwise(F.length(a[0].col.cast("string")))
                .cast("long")
            )
        dt = (a[0].dtype or "").replace(" ", "")
        if dt.startswith(("map", "array")):
            return F.size(a[0].col).cast("long")
        return F.length(a[0].col)

    def _precision(a, k):
        if "precision" in k:
            return _v(k["precision"])
        return _v(a[1]) if len(a) > 1 else 0

    def rnd(a, k):
        return F.round(a[0].col, _precision(a, k))

    def ceil(a, k):
        p = _precision(a, k)
        return F.ceil(a[0].col, p) if p else F.ceil(a[0].col)

    def floor(a, k):
        p = _precision(a, k)
        return F.floor(a[0].col, p) if p else F.floor(a[0].col)

    def sha2(a, k):
        var = (
            _v(k["variant"])
            if "variant" in k
            else (_v(a[1]) if len(a) > 1 else "SHA-512/256")
        )
        return crypto.sha2(a[0].col, var)

    def sha3(a, k):
        var = _v(k["variant"]) if "variant" in k else (_v(a[1]) if len(a) > 1 else 512)
        return crypto.sha3(a[0].col, int(str(var).replace("SHA3-", "")))

    def split(a, k):
        lim = _v(a[2]) if len(a) > 2 else -1
        return F.split(a[0].col, _v(a[1]), lim)

    def tag_types_externally(a, k):
        # external-JSON type tagging (tag_types_externally.cue): wrap each
        # scalar in {"<type>": value}, recursing into objects/arrays. Types
        # come from the engine's static knowledge (literals and tracked
        # flags) — a typed engine carries exactly this information.
        v = a[0]

        def tag(x):
            if isinstance(x, bool):
                return {"boolean": x}
            if isinstance(x, int):
                return {"integer": x}
            if isinstance(x, float):
                return {"float": x}
            if isinstance(x, str):
                return {"string": x}
            if isinstance(x, dict):
                return {kk: tag(vv) for kk, vv in x.items()}
            if isinstance(x, list):
                return [tag(i) for i in x]
            return None

        def col_of(x):
            if isinstance(x, dict):
                return F.struct(*[col_of(vv).alias(kk) for kk, vv in x.items()])
            if isinstance(x, list):
                return F.array(*[col_of(i) for i in x])
            return F.lit(x)

        if v.is_regex and v.has_lit:
            return _Val(
                F.struct(F.lit(v.lit).alias("regex")), is_obj=True
            )
        if v.is_ts:
            return _Val(F.struct(v.col.alias("timestamp")), is_obj=True)
        if v.is_null_lit:
            return F.lit(None)
        if v.has_lit:
            return _Val(col_of(tag(v.lit)), is_obj=True)
        if v.is_str:
            return _Val(F.struct(v.col.alias("string")), is_obj=True)
        raise VrlCompileError(
            "tag_types_externally needs a statically-typed argument"
        )

    reg: dict[str, object] = {
        # type conversion (remap/functions/to_*.cue)
        # string! ASSERTS stringness — a known non-string column type is a
        # compile error, mirroring VRL's checker (remap.toml *_error cases)
        "string": lambda a, k: _assert_string(a[0]),
        # to_string COERCES: null → "" (to_string.cue null behavior)
        "to_string": lambda a, k: F.coalesce(_render(a[0]), F.lit("")),
        "bool": lambda a, k: a[0].col.cast("boolean"),
        "to_bool": lambda a, k: a[0].col.cast("boolean"),
        "int": lambda a, k: a[0].col.try_cast("long"),
        "to_int": lambda a, k: a[0].col.try_cast("long"),
        "float": lambda a, k: a[0].col.try_cast("double"),
        "to_float": lambda a, k: a[0].col.try_cast("double"),
        "timestamp": lambda a, k: a[0].col.cast("timestamp"),
        # strings
        "upcase": lambda a, k: F.upper(a[0].col),
        "downcase": lambda a, k: F.lower(a[0].col),
        "snakecase": lambda a, k: strings.snakecase(a[0].col),
        "camelcase": lambda a, k: strings.camelcase(a[0].col),
        "pascalcase": lambda a, k: strings.pascalcase(a[0].col),
        "kebabcase": lambda a, k: strings.kebabcase(a[0].col),
        "screamingsnakecase": lambda a, k: strings.screamingsnakecase(a[0].col),
        "strip_whitespace": lambda a, k: strings.strip_whitespace(a[0].col),
        "strip_ansi_escape_codes": lambda a, k: strings.strip_ansi_escape_codes(a[0].col),
        "length": length,
        "strlen": length,
        "truncate": trunc,
        "slice": slice_,
        "replace": repl,
        "redact": redact,
        "sieve": lambda a, k: strings.sieve(a[0].col, _v(a[1])),
        "split": split,
        "join": lambda a, k: F.array_join(a[0].col, _v(a[1]) if len(a) > 1 else ""),
        "contains": lambda a, k: (
            a[0].col.contains(a[1].col)
            if len(a) < 3 or _v(a[2])
            else F.lower(a[0].col).contains(F.lower(a[1].col))
        ),
        "starts_with": lambda a, k: _affix(F.startswith, a),
        "ends_with": lambda a, k: _affix(F.endswith, a),
        "find": lambda a, k: strings.find(a[0].col, _v(a[1])),
        "match": lambda a, k: F.regexp_like(a[0].col, F.lit(_v(a[1]))),
        # numbers
        "round": rnd,
        "floor": floor,
        "ceil": ceil,
        "abs": lambda a, k: F.abs(a[0].col),
        "mod": lambda a, k: a[0].col % a[1].col,
        # checks
        "exists": lambda a, k: a[0].col.isNotNull(),
        "is_null": lambda a, k: a[0].col.isNull(),
        "is_nullish": is_nullish,
        "is_empty": lambda a, k: F.length(a[0].col) == 0,
        # type checks (is_*.cue family): variants answer from
        # schema_of_variant, typed columns from static knowledge
        "is_string": lambda a, k: _is_type(a[0], "STRING", ("string",)),
        "is_integer": lambda a, k: _is_type(
            a[0], "BIGINT", ("tinyint", "smallint", "int", "bigint")
        ),
        "is_float": lambda a, k: _is_type(
            a[0], "DOUBLE|FLOAT|DECIMAL", ("float", "double")
        ),
        "is_boolean": lambda a, k: _is_type(a[0], "BOOLEAN", ("boolean",)),
        "is_array": lambda a, k: _is_type(a[0], "ARRAY", ("array",)),
        "is_object": lambda a, k: _is_type(
            a[0], "OBJECT", ("map", "struct")
        ),
        "is_timestamp": lambda a, k: _is_type(
            a[0], "TIMESTAMP", ("timestamp",)
        ),
        # type assertions over dynamic JSON
        "object": lambda a, k: (
            _Val(a[0].col.try_cast("map<string,variant>"), elem_variant=True)
            if a[0].is_variant
            else a[0].col
        ),
        "array": lambda a, k: _arr(a[0]),
        # crypto / encode (remap/functions/{md5,sha1,…}.cue)
        "md5": lambda a, k: crypto.md5(a[0].col),
        "sha1": lambda a, k: crypto.sha1(a[0].col),
        "sha2": sha2,
        "sha3": sha3,
        "hmac": lambda a, k: crypto.hmac_sha256(a[0].col, _v(a[1])),
        "encode_base64": lambda a, k: crypto.encode_base64(a[0].col),
        "decode_base64": lambda a, k: crypto.decode_base64(a[0].col),
        "encode_base16": lambda a, k: crypto.encode_base16(a[0].col),
        "decode_base16": lambda a, k: crypto.decode_base16(a[0].col),
        "encode_json": lambda a, k: F.to_json(a[0].col),
        "seahash": lambda a, k: crypto.seahash(a[0].col),
        "uuid_v4": lambda a, k: F.expr("uuid()"),
        "uuid_v7": lambda a, k: parse.uuid_v7(
            a[0].col if a else F.current_timestamp(), F.expr("uuid()")
        ),
        # parse family
        "parse_json": parse_json,
        "parse_timestamp": parse_ts,
        "format_timestamp": format_ts,
        "to_unix_timestamp": to_unix,
        "from_unix_timestamp": lambda a, k: F.timestamp_seconds(a[0].col),
        "parse_int": lambda a, k: parse.parse_int(a[0].col),
        "parse_float": lambda a, k: parse.parse_float(a[0].col),
        "parse_duration": lambda a, k: parse.parse_duration(
            a[0].col,
            _v(k["unit"]) if "unit" in k else (_v(a[1]) if len(a) > 1 else "s"),
        ),
        "parse_key_value": lambda a, k: parse.parse_key_value(a[0].col),
        "parse_query_string": lambda a, k: parse.parse_query_string(a[0].col),
        "parse_url": lambda a, k: parse.parse_url(a[0].col),
        "parse_common_log": parse_clf_vrl,
        "parse_apache_log": lambda a, k: parse.parse_apache_log(
            a[0].col, _v(k["format"]) if "format" in k else "common"
        ),
        "parse_syslog": parse_syslog_vrl,
        "parse_glog": parse_glog_vrl,
        "parse_tokens": lambda a, k: parse.parse_tokens(a[0].col),
        "parse_grok": lambda a, k: __import__(
            "vector_spark.functions.grok", fromlist=["parse_grok"]
        ).parse_grok(a[0].col, _v(a[1])),
        "parse_aws_vpc_flow_log": lambda a, k: parse.parse_aws_vpc_flow_log(
            a[0].col,
            _v(k["format"]) if "format" in k else (_v(a[1]) if len(a) > 1 else None),
        ),
        "format_number": format_number,
        "parse_regex_all": parse_regex_all_vrl,
        # VRL regexes use Rust (?P<name>…) groups; Java regexp_extract wants
        # anonymous groups — strip the names, field order = group order
        "parse_regex": parse_regex_vrl,
        "parse_aws_alb_log": lambda a, k: parse.parse_aws_alb_log(a[0].col),
        "parse_aws_cloudwatch_log_subscription_message": lambda a, k: (
            parse.parse_aws_cloudwatch_log_subscription_message(a[0].col)
        ),
        # ip
        "ip_subnet": lambda a, k: ip.ip_subnet(a[0].col, _v(a[1])),
        "ip_cidr_contains": ip_cidr,
        "ip_aton": lambda a, k: ip.ip_aton(a[0].col),
        "ip_ntoa": lambda a, k: ip.ip_ntoa(a[0].col),
        "ip_to_ipv6": lambda a, k: ip.ip_to_ipv6(a[0].col),
        "ipv6_to_ipv4": lambda a, k: ip.ipv6_to_ipv4(a[0].col),
        # syslog
        "to_syslog_facility": lambda a, k: syslog.to_syslog_facility(a[0].col),
        "to_syslog_level": lambda a, k: syslog.to_syslog_level(a[0].col),
        "to_syslog_severity": lambda a, k: syslog.to_syslog_severity(a[0].col),
        # objects / arrays (variant arrays normalize to array<string>)
        "merge": merge,
        "get": get_fn,
        "set": set_fn,
        "remove": remove_fn,
        "flatten": flatten_fn,
        "push": lambda a, k: F.array_append(_arr(a[0]), a[1].col.cast("string") if a[0].is_variant else a[1].col),
        "append": lambda a, k: F.concat(_arr(a[0]), _arr(a[1])),
        "includes": lambda a, k: F.array_contains(a[0].col, a[1].col),
        "unique": lambda a, k: F.array_distinct(a[0].col),
        "compact": compact,
        # misc
        "tag_types_externally": tag_types_externally,
        "now": lambda a, k: F.current_timestamp(),
        "get_hostname": lambda a, k: F.lit(__import__("socket").gethostname()),
        # env vars resolve on the driver at plan time, like the reference's
        # config-load-time interpolation (get_env_var.cue)
        "get_env_var": lambda a, k: F.lit(
            __import__("os").environ.get(_v(a[0]))
        ),
        "get_timezone_name": lambda a, k: F.current_timezone(),
        # reverse_dns (reverse_dns.cue) — deterministic map lookup over
        # the RFC 6761 loopback names, falling back to the input (the
        # reference returns the IP string when no PTR record resolves).
        # The cluster-scale shape of rDNS is a pre-resolved dim table
        # broadcast-joined via operators/enrich.py — never a live resolver
        # call per row on 1000 executors.
        "reverse_dns": lambda a, k: _Val(
            F.coalesce(
                F.try_element_at(
                    F.create_map(
                        F.lit("127.0.0.1"), F.lit("localhost"),
                        F.lit("::1"), F.lit("localhost"),
                    ),
                    a[0].col.cast("string"),
                ),
                a[0].col.cast("string"),
            ),
            is_str=True,
        ),
        # match_datadog_query(., "query") — the second predicate language,
        # compiled by the datadog_search module
        "match_datadog_query": lambda a, k: __import__(
            "vector_spark.datadog_search", fromlist=["compile_datadog_search"]
        ).compile_datadog_search(_v(a[1] if len(a) > 1 else a[0])),
        # assert_eq!(a, b, msg) in condition position is just equality
        "assert_eq": lambda a, k: a[0].col == a[1].col,
        "assert": lambda a, k: F.coalesce(a[0].col, F.lit(False)),
    }
    return reg


_REG_CACHE: dict | None = None


def _lookup(name: str):
    global _REG_CACHE
    if _REG_CACHE is None:
        _REG_CACHE = _registry()
    fn = _REG_CACHE.get(name)
    if fn is None:
        raise VrlCompileError(
            f"VRL function {name!r} is not in the compiler registry "
            "(see vector_spark/vrl.py::_registry)"
        )
    return fn


# --- compiled program ---------------------------------------------------------


@dataclass
class CompiledProgram:
    """Order-independent assignments over the ORIGINAL columns — apply with
    ``remap(..., simultaneous=True)`` or :func:`remap_program`. When
    ``root`` is set (`. = expr`), the event is REPLACED by the expression's
    struct fields (array-of-struct explodes, scalar becomes ``message``),
    with ``assignments`` overlaid on top."""

    assignments: dict[str, Column]
    drops: list[str]
    abort_when: Column | None
    error_when: Column | None
    root: Column | None = None


class _Compiler:
    def __init__(
        self,
        tokens: list[tuple[str, str, bool]],
        columns: set[str] | dict[str, str] | None = None,
    ):
        self.toks = tokens
        self.i = 0
        self.columns = set(columns) if columns is not None else None
        self.dtypes = columns if isinstance(columns, dict) else {}
        self.env: dict[str, Column] = {}
        self.env_dtype: dict[str, str] = {}  # known dtypes of assigned
        # paths (maps/arrays keep their container type for length/get)
        self.root: Column | None = None  # `. = expr` replacement root
        self.vars: dict[str, _Val] = {}  # VRL local variables
        self.indexed: dict[str, dict[int, object]] = {}  # `.a[i]` writes
        self.secrets: dict[str, _Val] = {}  # set_secret/get_secret state
        # name → list[dict] rows for get/find_enrichment_table_records
        self.enrichment_tables: dict[str, list[dict]] = {}
        # path → (is_str, is_ts, is_variant); seeded from input dtypes
        self.meta: dict[str, tuple[bool, bool, bool]] = {}
        if isinstance(columns, dict):
            for name, dt in columns.items():
                self.meta[name] = (
                    dt == "string",
                    dt.startswith("timestamp"),
                    dt == "variant",
                    dt in ("map<string,variant>", "array<variant>"),
                )
        self.dropped: set[str] = set()
        self.aborts: list[Column] = []
        self.errors: list[Column] = []

    # -- token helpers
    def peek(self):
        return self.toks[self.i][:2]

    def peek_nl(self) -> bool:
        return self.toks[self.i][2]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t[:2]

    def expect(self, val):
        kind, v = self.next()
        if v != val:
            raise VrlCompileError(f"expected {val!r}, got {v!r}")

    # -- env: every read resolves through prior assignments (sequential VRL
    # semantics by substitution). The LONGEST assigned prefix wins so that
    # `.data = parse_json!(.data); .data.arr` navigates the variant, not
    # the original string column.
    def _path_key(self, val: str) -> str:
        """Consume a (possibly quoted-segment) path starting at the given
        path token value; returns the internal SEP-joined key."""
        segs = [s for s in val[1:].split(".") if s]
        pending = val.endswith(".") or val == "."
        while pending and self.peek()[0] == "str":
            segs.append(_unquote(self.next()[1]))
            pending = False
            if self.peek()[0] == "path" and not self.peek_nl():
                nxt = self.next()[1]
                segs += [s for s in nxt[1:].split(".") if s]
                pending = nxt.endswith(".")
        return SEP.join(segs)

    def path_val(self, path: str) -> _Val:
        parts = path.split(SEP)
        for cut in range(len(parts), 0, -1):
            prefix = SEP.join(parts[:cut])
            if prefix in self.env:
                v = _Val(self.env[prefix])
                if prefix in self.meta:
                    v.is_str, v.is_ts, v.is_variant = self.meta[prefix][:3]
                    if len(self.meta[prefix]) > 3:
                        v.elem_variant = self.meta[prefix][3]
                if not parts[cut:]:
                    v.dtype = self.env_dtype.get(prefix)
                return self._navigate(v, parts[cut:])
            if prefix in self.dropped:
                return _Val(F.lit(None))
        if self.root is not None:
            # after `. = expr`, reads resolve against the new root
            return self._navigate(_Val(self.root), parts)
        if self.columns is not None and parts[0] not in self.columns:
            ev = [c for c in self.columns if not c.startswith("__")]
            if ev == ["message"] and self.dtypes.get("message") == "variant":
                # single-`message`-variant event (a dynamic `. = <map>` /
                # `. = parse_json(…)` root) — paths navigate the variant
                return self._navigate(
                    _Val(F.col("message"), is_variant=True), parts
                )
            # missing field reads as null (VRL missing-path semantics)
            return _Val(F.lit(None))
        root_col = (
            F.col(f"`{parts[0]}`") if "." in parts[0] else F.col(parts[0])
        )
        base = _Val(root_col, dtype=self.dtypes.get(parts[0]))
        if parts[0] in self.meta:
            m = self.meta[parts[0]]
            base.is_str, base.is_ts, base.is_variant = m[:3]
            if len(m) > 3:
                base.elem_variant = m[3]
        return self._navigate(base, parts[1:])

    @staticmethod
    def _navigate(v: _Val, parts: list[str]) -> _Val:
        for p in parts:
            if v.is_variant:
                # bracket form survives keys containing dots
                path = f"$.{p}" if re.fullmatch(r"\w+", p) else f"$['{p}']"
                v = _Val(
                    F.try_variant_get(v.col, path, "variant"),
                    is_variant=True,
                )
            else:
                v = _Val(v.col.getItem(p), is_variant=v.elem_variant)
        return v

    def read(self, path: str) -> Column:
        return self.path_val(path).col

    # -- program
    def compile(self, guard: Column | None = None) -> None:
        while self.peek()[0] != "eof" and self.peek()[1] != "}":
            self.statement(guard)

    def statement(self, guard: Column | None) -> None:
        kind, val = self.peek()
        if val == ";":
            self.next()
            return
        if kind == "word" and val == "if":
            self.next()
            self.if_stmt(guard)
            return
        if kind == "word" and val == "abort":
            self.next()
            self.aborts.append(guard if guard is not None else F.lit(True))
            return
        if kind == "word" and val == "del":
            self.next()
            self.expect("(")
            _, p = self.next()
            if not p.startswith("."):
                raise VrlCompileError("del() takes a path")
            path = self._path_key(p)
            self.expect(")")
            if guard is None:
                self.env.pop(path, None)
                self.dropped.add(path)
            else:
                self.env[path] = F.when(~guard, self.read(path))
            return
        if kind == "word" and val == "log":
            # log(...) has no event effect — parse and discard the args
            self.next()
            self.expect("(")
            depth = 1
            while depth:
                _, v2 = self.next()
                depth += v2 == "("
                depth -= v2 == ")"
            return
        if kind == "word" and val in ("for_each", "for_each!") and (
            self.toks[self.i + 1][1] == "("
        ):
            # statement-position enumeration closure: its whole effect is
            # mutating outer accumulator variables (for_each.cue)
            self.next()
            self.call(val)
            return
        if kind == "word" and val in ("set_secret", "remove_secret") and (
            self.toks[self.i + 1][1] == "("
        ):
            # statement-position secret ops — compile-time sequential
            # state, the vectorized twin of the reference's metadata
            # secret store (set_secret.cue / remove_secret.cue)
            self.next()
            self.expr_call_discard(val)
            return
        if kind == "word" and val in ("assert", "assert!"):
            # assert!(cond, message: …) — a failing assertion errors the
            # program (assert.cue); vectorized: error_when |= guard & !cond
            self.next()
            self.expect("(")
            cond = self.expr()
            kwargs_junk = None
            while self.peek()[1] == ",":
                self.next()
                if self.toks[self.i + 1][1] == ":":
                    self.next()
                    self.next()
                kwargs_junk = self.expr()
            del kwargs_junk
            self.expect(")")
            bad = ~F.coalesce(cond.col, F.lit(False))
            self.errors.append((guard & bad) if guard is not None else bad)
            return
        if kind == "word" and self.toks[self.i + 1][1] == "=" and (
            self.i + 2 >= len(self.toks) or self.toks[self.i + 2][1] != "="
        ):
            # VRL local variable: `items = [...]` — compile-time binding,
            # never an event field
            self.next()
            self.expect("=")
            self.vars[val] = self.expr()
            return
        if kind == "meta":
            # `%` / `%key = expr` — the event-METADATA namespace
            # (vrl_test_input.toml, remap.rs metadata targets); stored
            # under the reserved __metadata column family
            self.next()
            self.expect("=")
            rhs = self.expr()
            mkey = "__metadata" + (
                SEP + SEP.join(val[1:].split(".")) if val != "%" else ""
            )
            self.env[mkey] = rhs.col
            self.meta[mkey] = (rhs.is_str, rhs.is_ts, rhs.is_variant, False)
            return
        if kind == "path":
            self.next()
            if val == "." and self.peek()[0] == "eof":
                # trailing `.` — VRL's "return the event" idiom; the event
                # IS the output here, so it's a no-op
                return
            if val == "." and self.peek()[1] == "=":
                # `. = expr` replaces the whole event (remap.rs:591-596)
                if guard is not None:
                    raise VrlCompileError("guarded root assignment unsupported")
                self.expect("=")
                rhs = self.expr()
                for f in rhs.fallible:
                    self.errors.append(f.isNull())
                self.root = rhs.col
                self.env.clear()
                self.meta.clear()
                self.dropped.clear()
                return
            key = self._path_key(val)
            if self.peek()[1] == "[":
                # `.a[i] = literal` — indexed writes accumulate into a
                # heterogeneous (variant) array, like VRL's dynamic arrays
                self.next()
                idx = self.expr()
                self.expect("]")
                self.expect("=")
                rhs = self.expr()
                if not (rhs.has_lit or rhs.is_null_lit) or not idx.has_lit:
                    raise VrlCompileError(
                        "indexed assignment needs literal index and value"
                    )
                if guard is not None:
                    raise VrlCompileError("guarded indexed assignment unsupported")
                arr = self.indexed.setdefault(key, {})
                arr[int(idx.lit)] = None if rhs.is_null_lit else rhs.lit
                import json as _json

                vals = [
                    arr.get(i) for i in range(max(arr) + 1)
                ]
                self.env[key] = F.try_parse_json(F.lit(_json.dumps(vals)))
                self.meta[key] = (False, False, True, False)
                return
            err_target = None
            if self.peek()[1] == ",":
                # `.res, err = expr` — error-capturing assignment. The
                # error slot gets null on success and the reference's
                # message text when the failure is statically computable.
                self.next()
                ekind, eval_ = self.next()
                if ekind == "path":
                    err_target = self._path_key(eval_)
                elif ekind == "word":
                    err_target = ""  # local `err` variable — discarded
                else:
                    raise VrlCompileError("bad error-capture target")
            self.expect("=")
            rhs = self.expr()
            path = key
            if err_target is not None:
                # capturing the error handles it — clear fallibility; a
                # failed arithmetic expression yields the numeric default
                # 0.0 (VRL fallible-assignment default-value semantics)
                col = (
                    F.coalesce(rhs.col, F.lit(0.0)) if rhs.is_num else rhs.col
                )
                emsg = rhs.err_msg
                rhs = _Val(col, rhs.lit, rhs.has_lit, [])
                if err_target:
                    # the error slot carries the reference's message text
                    # when the failure is statically known, else null
                    self.env[err_target] = (
                        emsg if emsg is not None
                        else F.lit(None).cast("string")
                    )
                    self.meta[err_target] = (True, False, False, False)
            for f in rhs.fallible:
                self.errors.append(
                    (guard & f.isNull()) if guard is not None else f.isNull()
                )
            new = rhs.col
            if guard is not None:
                new = F.when(guard, new).otherwise(self.read(path))
            self.env[path] = new
            self.meta[path] = (
                rhs.is_str,
                rhs.is_ts,
                rhs.is_variant,
                rhs.elem_variant,
            )
            if rhs.dtype:
                self.env_dtype[path] = rhs.dtype
            else:
                self.env_dtype.pop(path, None)
            self.dropped.discard(path)
            return
        raise VrlCompileError(f"unexpected token {val!r} at statement start")

    def if_stmt(self, guard: Column | None) -> None:
        cond = self.expr().col
        g = cond if guard is None else (guard & cond)
        self.expect("{")
        self.compile(g)
        self.expect("}")
        if self.peek()[1] == "else":
            self.next()
            neg = ~cond if guard is None else (guard & ~cond)
            if self.peek()[1] == "if":
                self.next()
                self.if_stmt(neg)
            else:
                self.expect("{")
                self.compile(neg)
                self.expect("}")

    # -- expressions
    def expr(self) -> _Val:
        return self.coalesce()

    def coalesce(self) -> _Val:
        left = self.or_()
        while self.peek()[1] == "??":
            self.next()
            right = self.or_()
            # the ?? handles the left side's error → clear its fallibility.
            # VRL is dynamically typed; on a typed engine a string fallback
            # normalizes the whole expression to string (complex types cast
            # to their JSON-ish rendering).
            lcol = left.col
            if right.has_lit and isinstance(right.lit, str):
                lcol = lcol.cast("string")
            left = _Val(F.coalesce(lcol, right.col), fallible=right.fallible)
        return left

    def or_(self) -> _Val:
        c = self.and_()
        while self.peek()[1] == "||":
            self.next()
            r = self.and_()
            c = _Val(c.col | r.col, fallible=c.fallible + r.fallible)
        return c

    def and_(self) -> _Val:
        c = self.cmp()
        while self.peek()[1] == "&&":
            self.next()
            r = self.cmp()
            c = _Val(c.col & r.col, fallible=c.fallible + r.fallible)
        return c

    def cmp(self) -> _Val:
        left = self.add()
        op = self.peek()[1]
        if op in ("==", "!=", ">=", "<=", ">", "<"):
            self.next()
            right = self.add()
            # `x == null` means null-ness, not three-valued SQL equality
            if op in ("==", "!=") and (right.is_null_lit or left.is_null_lit):
                subj = left if right.is_null_lit else right
                col = subj.col.isNull() if op == "==" else subj.col.isNotNull()
                return _Val(col, fallible=left.fallible + right.fallible)
            # `x == []` means emptiness (a typed engine can't compare to a
            # void-typed empty literal)
            if op in ("==", "!="):
                for a_, b_ in ((left, right), (right, left)):
                    if b_.has_lit and b_.lit == []:
                        col = F.size(a_.col) == 0
                        if op == "!=":
                            col = ~col
                        return _Val(col, fallible=left.fallible + right.fallible)
            # object-literal comparison: a typed engine can't equate a
            # struct literal with differently-typed fields (void nulls,
            # map vs struct) — compare canonical JSON renderings instead
            # (null fields drop from both sides)
            if op in ("==", "!=") and (left.is_obj or right.is_obj):
                col = F.to_json(left.col) == F.to_json(right.col)
                if op == "!=":
                    col = ~col
                return _Val(col, fallible=left.fallible + right.fallible)
            # dynamic JSON: cast the variant side to its comparand's type
            if left.is_variant or right.is_variant:
                var, other = (left, right) if left.is_variant else (right, left)
                t = "string"
                if other.has_lit:
                    t = {bool: "boolean", int: "long", float: "double"}.get(
                        type(other.lit), "string"
                    )
                var.col = var.col.try_cast(t)
                if other.is_variant:
                    other.col = other.col.try_cast(t)
            col = {
                "==": left.col == right.col, "!=": left.col != right.col,
                ">=": left.col >= right.col, "<=": left.col <= right.col,
                ">": left.col > right.col, "<": left.col < right.col,
            }[op]
            return _Val(col, fallible=left.fallible + right.fallible)
        return left

    def add(self) -> _Val:
        c = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            r = self.mul()
            stringy = c.is_str or r.is_str
            if op == "+" and stringy:
                col = F.concat(c.col.cast("string"), r.col.cast("string"))
            else:
                col = c.col + r.col if op == "+" else c.col - r.col
            c = _Val(
                col,
                fallible=c.fallible + r.fallible,
                is_str=stringy,
                is_num=not stringy,
            )
        return c

    def mul(self) -> _Val:
        c = self.unary()
        # a line-initial `%` is the metadata root, never modulo
        while self.peek()[1] in ("*", "/", "%") and not (
            self.peek()[1] == "%" and self.peek_nl()
        ):
            op = self.next()[1]
            r = self.unary()
            # VRL arithmetic errors are values (capturable) — never engine
            # exceptions, so ANSI-safe try_ variants
            col = {
                "*": c.col * r.col,
                "/": F.try_divide(c.col, r.col),
                "%": F.try_mod(c.col, r.col),
            }[op]
            c = _Val(col, fallible=c.fallible + r.fallible, is_num=True)
        return c

    def unary(self) -> _Val:
        if self.peek()[1] == "!":
            self.next()
            v = self.unary()
            return _Val(~v.col, fallible=v.fallible)
        if self.peek()[1] == "-":
            self.next()
            v = self.unary()
            if v.has_lit and isinstance(v.lit, (int, float)):
                return _lit(-v.lit)
            return _Val(-v.col, fallible=v.fallible)
        return self.postfix()

    def postfix(self) -> _Val:
        v = self.primary()
        while True:
            kind, val = self.peek()
            if kind == "path" and not self.peek_nl():
                # .field access on a call result / map — same line only
                self.next()
                segs = self._path_key(val).split(SEP)
                fallible = v.fallible
                v = self._navigate(v, [s for s in segs if s])
                v.fallible = fallible
            elif val == "[":
                self.next()
                idx = self.expr()
                self.expect("]")
                if v.is_variant:
                    col = F.try_variant_get(v.col, f"$[{_v(idx)}]", "variant")
                else:
                    col = v.col.getItem(_v(idx))
                v = _Val(
                    col,
                    fallible=v.fallible + idx.fallible,
                    is_variant=v.is_variant,
                )
            else:
                return v

    def primary(self) -> _Val:
        kind, val = self.next()
        if val == "(":
            v = self.expr()
            self.expect(")")
            return v
        if val == "[":
            items = []
            while self.peek()[1] != "]":
                items.append(self.expr())
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            if all(i.has_lit or i.is_null_lit for i in items):
                vals = [None if i.is_null_lit else i.lit for i in items]
                if any(isinstance(x, dict) for x in vals):
                    # object elements: build structurally (F.lit can't
                    # take dicts), compare via JSON rendering
                    def col_of(x):
                        if isinstance(x, dict):
                            return F.struct(
                                *[col_of(v2).alias(k2) for k2, v2 in x.items()]
                            )
                        if isinstance(x, list):
                            return F.array(*[col_of(i2) for i2 in x])
                        return F.lit(x)

                    return _Val(
                        col_of(vals), vals, has_lit=True, is_obj=True
                    )
                kinds = {type(x) for x in vals if x is not None}
                if len(kinds) > 1 or any(x is None for x in vals):
                    # heterogeneous / null-holed array literal → variant,
                    # compared via JSON rendering
                    import json as _json

                    return _Val(
                        F.try_parse_json(F.lit(_json.dumps(vals))),
                        vals,
                        has_lit=True,
                        is_obj=True,
                        is_variant=True,
                    )
                out = _lit(vals)
                out.items = items
                return out
            return _Val(F.array(*[i.col for i in items]), items=items)
        if val == "{":
            # object literal → struct (VRL objects are our typed structs)
            fields = {}
            while self.peek()[1] != "}":
                fkind, fname = self.next()
                if fkind == "str":
                    fname = _unquote(fname)
                elif fkind != "word":
                    raise VrlCompileError(f"bad object key {fname!r}")
                self.expect(":")
                fields[fname] = self.expr()
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            out = _Val(
                F.struct(
                    *[
                        # type a bare null as string: it only matters for
                        # JSON-rendering comparisons, which drop nulls
                        (
                            v.col.cast("string")
                            if v.is_null_lit
                            else v.col
                        ).alias(k)
                        for k, v in fields.items()
                    ]
                ),
                is_obj=True,
            )
            if all(v.has_lit or v.is_null_lit for v in fields.values()):
                out.lit = {
                    k: (None if v.is_null_lit else v.lit)
                    for k, v in fields.items()
                }
                out.has_lit = True
            out.fields = fields
            return out
        if kind == "meta":
            return self.path_val(
                "__metadata"
                + (SEP + SEP.join(val[1:].split(".")) if val != "%" else "")
            )
        if kind == "path":
            if val == "." and self.peek()[0] != "str":
                # `.` as a VALUE — the whole event. A one-column `message`
                # event round-trips the scalar-root convention; otherwise
                # the event is its struct of (non-internal) columns.
                if self.columns:
                    ev_cols = [
                        c for c in sorted(self.columns)
                        if not c.startswith("__")
                    ]
                    if ev_cols == ["message"]:
                        return self.path_val("message")
                    if ev_cols:
                        return _Val(
                            F.struct(*[self.read(c) for c in ev_cols]),
                            is_obj=True,
                        )
                return _Val(F.lit(None))
            return self.path_val(self._path_key(val))
        if kind == "str":
            v = _lit(_unquote(val))
            v.is_regex = val.startswith("r'")
            return v
        if kind == "num":
            return _lit(float(val) if "." in val else int(val))
        if kind == "word":
            if val in ("true", "false"):
                return _lit(val == "true")
            if val == "null":
                return _Val(F.lit(None), is_null_lit=True)
            if val == "if":
                # if-EXPRESSION: `if c { a } else { b }` → when/otherwise
                cond = self.expr()
                self.expect("{")
                then = self.expr()
                self.expect("}")
                otherwise = None
                if self.peek()[1] == "else":
                    self.next()
                    if self.peek()[1] == "if":
                        self.next()
                        otherwise = self.primary_if()
                    else:
                        self.expect("{")
                        otherwise = self.expr()
                        self.expect("}")
                col = F.when(cond.col, then.col)
                if otherwise is not None:
                    col = col.otherwise(otherwise.col)
                return _Val(
                    col,
                    fallible=cond.fallible
                    + then.fallible
                    + (otherwise.fallible if otherwise else []),
                    is_str=then.is_str,
                    is_ts=then.is_ts,
                    is_variant=then.is_variant,
                )
            if val in self.vars:
                return self.vars[val]
            if self.peek()[1] == "(":
                return self.call(val)
            raise VrlCompileError(f"unknown identifier {val!r}")

    def primary_if(self) -> _Val:
        # re-enter the if-expression branch after an `else if`
        at = self.toks[self.i][3]
        self.toks.insert(self.i, ("word", "if", False, at, at))
        return self.primary()
        raise VrlCompileError(f"unexpected token {val!r}")

    def _enrichment_lookup(self, fname: str, args: list[_Val]) -> _Val:
        tname = _v(args[0])
        cond = args[1]
        rows = self.enrichment_tables.get(tname)
        if rows is None:
            raise VrlCompileError(
                f"enrichment table {tname!r} not provided to the compiler "
                "(pass enrichment_tables={name: rows})"
            )
        if not cond.fields:
            raise VrlCompileError(
                "enrichment condition must be an object literal of "
                "{field: expr}"
            )
        keys = list(cond.fields)
        fieldnames = list(rows[0]) if rows else []
        from collections import defaultdict

        groups: dict[str, list[dict]] = defaultdict(list)
        for r in rows:
            groups[SEP.join(str(r[k]) for k in keys)].append(r)

        def row_struct(r: dict) -> Column:
            return F.struct(*[F.lit(r[f]).alias(f) for f in fieldnames])

        pairs: list[Column] = []
        for gk, grows in groups.items():
            pairs.append(F.lit(gk))
            pairs.append(F.array(*[row_struct(r) for r in grows]))
        table = F.create_map(*pairs)
        probe = F.concat_ws(
            SEP, *[cond.fields[k].col.cast("string") for k in keys]
        )
        hit = F.element_at(table, probe)
        if fname == "find_enrichment_table_records":
            # a miss is the empty list — same-typed empty array derived
            # from an existing group array
            return _Val(
                F.coalesce(hit, F.slice(pairs[1], 1, 0))
                if pairs
                else F.lit(None),
                is_obj=True,
            )
        # 0-or-1 contract: a multi-row hit takes the first (the reference
        # errors; our gate queries pin the strict form in operators/enrich)
        one = hit.getItem(0)
        fallible = [one]
        return _Val(one, fallible=fallible, is_obj=True)

    # -- closures (`fn(args) -> |p1, p2| { body }`) ---------------------------
    #
    # The reference's enumeration functions take closure blocks
    # (website/cue/reference/remap/functions/{for_each,filter,map_keys,
    # map_values}.cue). Expression-bodied closures compile to Spark
    # higher-order functions (F.transform / F.filter / F.map_filter /
    # F.transform_keys / F.transform_values) — the lambda re-runs the
    # body's symbolic evaluation with the closure parameters bound to the
    # lambda's Columns, so the emitted plan is pure JVM-side HOF
    # expressions, no Python per element. `for_each` statement bodies
    # compile to F.aggregate over the collection with a struct
    # accumulator holding every OUTER variable the body reassigns
    # (VRL scoping: mutations to parent-scope variables persist, closure
    # locals don't — exactly the accumulator/local split).
    #
    # Deviations, all loud or documented: `recursive: true` on
    # map_keys/map_values iterates nested collections to the STATIC
    # schema's depth (keys: exact reference semantics; values: the
    # closure applies to scalar leaves and recurses through collection
    # values — a scalar closure can't type-check against a map in a
    # static plan); for_each stays non-recursive like the reference;
    # closure bodies may carry local-variable assignment statements
    # before their final value expression (VRL block semantics);
    # element-wise a body is infallible — a `!` assertion inside yields
    # a NULL element instead of aborting the whole program (lambda-scoped
    # columns cannot escape into the program-level error predicate);
    # targets must be statically-typed arrays or maps (wrap in
    # `array!()`, or declare the column dtype) — VRL's dynamic-object
    # iteration over struct-typed events stays out of scope, as does the
    # dynamic-key object mutation of the for_each tally example
    # (frequency maps are groupBy aggregations on a distributed engine,
    # not per-row loops; see operators/log_to_metric.py).

    def _parse_closure(self) -> tuple[list[str], list]:
        """Parse ``-> |p, q| { ... }``; returns (params, body tokens)."""
        self.expect("->")
        self.expect("|")
        params: list[str] = []
        while self.peek()[1] != "|":
            kind, val = self.next()
            if kind != "word":
                raise VrlCompileError("closure parameters must be identifiers")
            params.append(val)
            if self.peek()[1] == ",":
                self.next()
        self.expect("|")
        self.expect("{")
        depth, start = 1, self.i
        while depth:
            kind, val = self.next()
            if kind == "eof":
                raise VrlCompileError("unterminated closure body")
            if val == "{":
                depth += 1
            elif val == "}":
                depth -= 1
        end = self.toks[self.i - 1][4]
        return params, list(self.toks[start : self.i - 1]) + [
            ("eof", "", True, end, end)
        ]

    def _closure_scope(self, body_toks: list, bindings: dict) -> "_Compiler":
        sub = _Compiler(list(body_toks))
        sub.columns = self.columns
        sub.dtypes = self.dtypes
        sub.env = dict(self.env)
        sub.env_dtype = dict(self.env_dtype)
        sub.meta = dict(self.meta)
        sub.vars = dict(self.vars)
        sub.vars.update(bindings)
        sub.secrets = dict(self.secrets)
        sub.enrichment_tables = self.enrichment_tables
        sub.dropped = set(self.dropped)
        return sub

    def _closure_expr(self, body_toks: list, bindings: dict) -> Column:
        """Value-producing closure body: zero or more local-variable
        assignments followed by a final expression whose value is the
        closure's result (VRL block semantics — the block evaluates to
        its last statement; locals are closure-scoped and discarded)."""
        sub = self._closure_scope(body_toks, bindings)
        while True:
            while sub.peek()[1] == ";":
                sub.next()
            kind, val = sub.peek()
            if (
                kind == "word"
                and sub.toks[sub.i + 1][1] == "="
                and (
                    sub.i + 2 >= len(sub.toks)
                    or sub.toks[sub.i + 2][1] != "="
                )
            ):
                sub.next()
                sub.expect("=")
                sub.vars[val] = sub.expr()
                continue
            out = sub.expr()
            while sub.peek()[1] == ";":
                sub.next()
            if sub.peek()[0] != "eof":
                raise VrlCompileError(
                    "closure-body statements before the final value must "
                    "be local-variable assignments (`x = ...`); the last "
                    "statement is the closure's value (for event-path "
                    "writes use for_each... which also forbids them)"
                )
            return out.col

    @staticmethod
    def _acc_dtype(name: str, v: _Val) -> str:
        if v.has_lit and not v.is_obj:
            t = {bool: "boolean", int: "long", float: "double",
                 str: "string"}.get(type(v.lit))
            if t:
                return t
        if v.is_str:
            return "string"
        if v.dtype:
            return v.dtype
        raise VrlCompileError(
            f"for_each accumulator {name!r} needs a literal-initialized "
            "outer variable (e.g. `count = 0`) so the accumulator type "
            "is known at plan time"
        )

    @staticmethod
    def _generic_parts(dt: str) -> list[str]:
        """Split a normalized dtype string's type arguments at depth 0:
        ``map<string,map<string,string>>`` -> ``["string",
        "map<string,string>"]``."""
        inner = dt[dt.index("<") + 1 : -1]
        parts, depth, cur = [], 0, ""
        for ch in inner:
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                depth += ch == "<"
                depth -= ch == ">"
                cur += ch
        parts.append(cur)
        return parts

    def _rec_map_values(self, col: Column, dt: str, body: list,
                        params: list[str]) -> Column:
        """``map_values(recursive: true)`` (map_values.cue): iterate into
        nested collections to the static schema's bounded depth — the same
        trick the dynamic-path compiler uses. Deviation from the dynamic
        reference, documented: the closure is applied to SCALAR values
        only; nested collection values are recursed into rather than first
        passed whole to the closure (a scalar closure cannot type-check
        against a map in a statically-typed plan). This matches the
        reference's canonical recursive examples (upcase/de-dot leaves)."""
        dt = (dt or "").replace(" ", "")
        if dt.startswith("array<"):
            inner = dt[6:-1]
            if inner.startswith(("array<", "map<")):
                return F.transform(
                    col,
                    lambda x: self._rec_map_values(x, inner, body, params),
                )
            if inner.startswith("struct<"):
                raise VrlCompileError(
                    "recursive map_values cannot descend into a "
                    "struct-typed element: a scalar closure cannot "
                    "type-check against a struct in a statically-typed "
                    "plan - model heterogeneous objects as "
                    "map<string,...> (parse_json keeps maps) or rewrite "
                    "the fields individually"
                )
            return F.transform(
                col,
                lambda x: self._closure_expr(
                    body, {params[0]: _Val(x, is_str=inner == "string")}
                ),
            )
        if dt.startswith("map<"):
            _kt, vt = self._generic_parts(dt)
            if vt.startswith(("array<", "map<")):
                return F.transform_values(
                    col,
                    lambda k, v: self._rec_map_values(v, vt, body, params),
                )
            if vt.startswith("struct<"):
                raise VrlCompileError(
                    "recursive map_values cannot descend into a "
                    "struct-typed value: a scalar closure cannot "
                    "type-check against a struct in a statically-typed "
                    "plan - model heterogeneous objects as "
                    "map<string,...> (parse_json keeps maps) or rewrite "
                    "the fields individually"
                )
            return F.transform_values(
                col,
                lambda k, v: self._closure_expr(
                    body, {params[0]: _Val(v, is_str=vt == "string")}
                ),
            )
        raise VrlCompileError(
            "recursive map_values target must be a statically-typed "
            "array or map column"
        )

    def _rec_map_keys(self, col: Column, dt: str, body: list,
                      params: list[str]) -> Column:
        """``map_keys(recursive: true)`` (map_keys.cue rules 1-3): rename
        keys at every nesting level, recursing through map values and
        through arrays that contain maps, bounded by the static schema
        depth. Keys are always strings, so unlike _rec_map_values this is
        the reference semantics exactly."""
        dt = (dt or "").replace(" ", "")
        if dt.startswith("struct<") and "map<" in dt:
            # a struct cannot have its fields renamed (static schema) and
            # hides any renameable maps inside it from the closure —
            # silently skipping would be a PARTIAL rename, worse than
            # failing loudly
            raise VrlCompileError(
                "recursive map_keys cannot rename keys inside a "
                "struct-typed value that contains nested maps - struct "
                "field names are fixed by the static schema; model the "
                "object as map<string,...> (parse_json keeps maps)"
            )
        if dt.startswith("map<"):
            _kt, vt = self._generic_parts(dt)
            out = F.transform_keys(
                col,
                lambda k, v: self._closure_expr(
                    body, {params[0]: _Val(k, is_str=True)}
                ),
            )
            if "map<" in vt:
                out = F.transform_values(
                    out,
                    lambda k, v: self._rec_map_keys(v, vt, body, params),
                )
            return out
        if dt.startswith("array<"):
            inner = dt[6:-1]
            if "map<" in inner:
                return F.transform(
                    col, lambda x: self._rec_map_keys(x, inner, body, params)
                )
            return col
        return col

    def _closure_call(self, fname: str, args: list[_Val],
                      kwargs: dict[str, _Val]) -> _Val:
        params, body = self._parse_closure()
        if not args:
            args.append(kwargs.pop("value", None) or _Val(F.lit(None)))
        rec = kwargs.get("recursive")
        if rec is None and fname in ("map_keys", "map_values") and len(args) > 1:
            rec = args[1]
        if rec is not None and not (
            rec.has_lit and isinstance(rec.lit, bool)
        ):
            raise VrlCompileError(
                f"the recursive flag of {fname} must be a literal boolean"
            )
        recursive = rec is not None and rec.lit is True
        if recursive and fname not in ("map_keys", "map_values"):
            raise VrlCompileError(
                f"{fname} closures are non-recursive (map_keys.cue / "
                "map_values.cue define recursive only for those two)"
            )
        target = args[0]
        dt = (target.dtype or "").replace(" ", "")
        is_arr = dt.startswith("array")
        is_map = dt.startswith("map")
        if not (is_arr or is_map):
            raise VrlCompileError(
                f"{fname} closure target must be a statically-typed array "
                "or map column (wrap in array!() / declare the dtype) — "
                "struct-typed objects don't support dynamic iteration"
            )
        col = target.col
        n = len(params)

        def _need(k: int) -> None:
            if n != k:
                raise VrlCompileError(
                    f"{fname} closure takes {k} parameter(s), got {n}"
                )

        if fname == "filter":
            # |index, value| on arrays, |key, value| on maps (filter.cue)
            _need(2)
            if is_arr:
                out = F.filter(
                    col,
                    lambda x, i: self._closure_expr(
                        body,
                        {params[0]: _Val(i.cast("long")), params[1]: _Val(x)},
                    ),
                )
                return _Val(out, dtype=target.dtype or "array")
            out = F.map_filter(
                col,
                lambda k, v: self._closure_expr(
                    body, {params[0]: _Val(k, is_str=True), params[1]: _Val(v)}
                ),
            )
            return _Val(out, dtype=target.dtype)
        if fname == "map_values":
            _need(1)
            if recursive:
                out = self._rec_map_values(col, dt, body, params)
                return _Val(out, dtype=target.dtype)
            if is_arr:
                out = F.transform(
                    col, lambda x: self._closure_expr(body, {params[0]: _Val(x)})
                )
                return _Val(out, dtype="array")
            out = F.transform_values(
                col,
                lambda k, v: self._closure_expr(body, {params[0]: _Val(v)}),
            )
            return _Val(out, dtype="map")
        if fname == "map_keys":
            _need(1)
            if not is_map:
                raise VrlCompileError("map_keys iterates objects, not arrays")
            if recursive:
                out = self._rec_map_keys(col, dt, body, params)
                return _Val(out, dtype=target.dtype)
            out = F.transform_keys(
                col,
                lambda k, v: self._closure_expr(
                    body, {params[0]: _Val(k, is_str=True)}
                ),
            )
            return _Val(out, dtype=target.dtype)
        if fname == "for_each":
            _need(2)
            # discovery pass: which OUTER variables does the body
            # reassign? (those become accumulator struct fields; body
            # locals are closure-scoped and discarded, event-path writes
            # inside closures are unsupported)
            probe = self._closure_scope(
                body,
                {params[0]: _Val(F.lit(None)), params[1]: _Val(F.lit(None))},
            )
            probe.compile()
            if (
                set(probe.env) != set(self.env)
                or probe.dropped != self.dropped
                or probe.aborts
            ):
                raise VrlCompileError(
                    "for_each closure bodies may only assign variables "
                    "(event-path writes / abort inside closures are "
                    "unsupported — assign the aggregate afterwards)"
                )
            # a closure parameter SHADOWS an outer variable of the same
            # name (VRL scoping): reassignments of it are closure-local,
            # never accumulator mutations — exclude params so the merge
            # lambda can't overwrite the parameter binding
            mutated = [
                name
                for name in self.vars
                if name not in params
                and probe.vars.get(name) is not self.vars[name]
            ]
            if not mutated:
                return _Val(F.lit(None), is_null_lit=True)
            types = {m: self._acc_dtype(m, self.vars[m]) for m in mutated}
            entries = F.map_entries(col) if is_map else F.transform(
                col, lambda x, i: F.struct(i.alias("i"), x.alias("v"))
            )
            init = F.struct(
                *[self.vars[m].col.cast(types[m]).alias(m) for m in mutated]
            )

            def merge(acc: Column, x: Column) -> Column:
                bind = (
                    {
                        params[0]: _Val(x["key"], is_str=True),
                        params[1]: _Val(x["value"]),
                    }
                    if is_map
                    else {
                        params[0]: _Val(x["i"].cast("long")),
                        params[1]: _Val(x["v"]),
                    }
                )
                for m in mutated:
                    bind[m] = _Val(
                        acc[m], is_str=types[m] == "string", dtype=types[m]
                    )
                sub = self._closure_scope(body, bind)
                sub.compile()
                return F.struct(
                    *[sub.vars[m].col.cast(types[m]).alias(m) for m in mutated]
                )

            agg = F.aggregate(entries, init, merge)
            for m in mutated:
                self.vars[m] = _Val(
                    agg.getField(m),
                    is_str=types[m] == "string",
                    dtype=types[m],
                )
            return _Val(F.lit(None), is_null_lit=True)
        raise VrlCompileError(
            f"{fname} does not take a closure (closures are for "
            "for_each/filter/map_keys/map_values)"
        )

    def expr_call_discard(self, name: str) -> None:
        """Parse and apply a statement-position call, discarding the value."""
        self.call(name)

    def call(self, name: str) -> _Val:
        fallible_assert = name.endswith("!")
        fname = name.rstrip("!")
        name_at = self.toks[self.i - 1][3]  # span start = the name token
        self.expect("(")
        args: list[_Val] = []
        kwargs: dict[str, _Val] = {}
        while self.peek()[1] != ")":
            kind, val = self.peek()
            if kind == "word" and self.toks[self.i + 1][1] == ":":
                self.next()
                self.next()
                kwargs[val] = self.expr()
            else:
                args.append(self.expr())
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        call_end = self.toks[self.i - 1][4]  # span end = the ")" token
        if self.peek()[1] == "->":
            return self._closure_call(fname, args, kwargs)
        if fname in (
            "get_enrichment_table_record",
            "find_enrichment_table_records",
        ):
            # lookup against a BROADCASTABLE enrichment dim, inlined as a
            # literal-map element_at — pure column math, exactly what a
            # broadcast hash join lowers to (enrichment/tables.rs contract)
            return self._enrichment_lookup(fname, args)
        if fname in ("set_secret", "get_secret", "remove_secret"):
            key = _v(args[0])
            if fname == "set_secret":
                self.secrets[key] = args[1]
                return _Val(F.lit(None))
            if fname == "remove_secret":
                self.secrets.pop(key, None)
                return _Val(F.lit(None))
            got = self.secrets.get(key)
            return (
                _Val(got.col, is_str=got.is_str)
                if got is not None
                else _Val(F.lit(None).cast("string"))
            )
        if fname in _ARG_ORDER:
            # merge named + positional into declaration order: named args
            # claim their slots, positionals fill the remaining slots
            # left-to-right (VRL allows positionals after named)
            pos = list(args)
            filled: list[_Val] = []
            for pname in _ARG_ORDER[fname]:
                if pname in kwargs:
                    filled.append(kwargs.pop(pname))
                elif pos:
                    filled.append(pos.pop(0))
                else:
                    break
            args = filled + pos
        elif "value" in kwargs:  # VRL's universal first-argument name
            args.insert(0, kwargs.pop("value"))
        res = _lookup(fname)(args, kwargs)
        inherited = [f for a in [*args, *kwargs.values()] for f in a.fallible]
        err_msg = None
        if (
            fname == "parse_json"
            and args
            and args[0].has_lit
            and isinstance(args[0].lit, str)
        ):
            # statically-known failure: render the reference's captured
            # error text — `function call error for "f" at (start:end):
            # unable to parse json: <serde message>` (remap.toml:311-329)
            m = _serde_json_error(args[0].lit)
            if m is not None:
                err_msg = F.lit(
                    f'function call error for "parse_json" at '
                    f"({name_at}:{call_end}): unable to parse json: {m}"
                )
        if isinstance(res, _Val):  # handler supplied its own type flags
            col = res.col
            return _Val(
                col,
                fallible=inherited + ([col] if fallible_assert else []),
                is_str=res.is_str,
                is_ts=res.is_ts,
                is_variant=res.is_variant,
                elem_variant=res.elem_variant,
                dtype=res.dtype,
                is_obj=res.is_obj,
                fields=res.fields,
                err_msg=err_msg,
            )
        col = res
        return _Val(
            col,
            fallible=inherited + ([col] if fallible_assert else []),
            is_str=fname in _STR_FUNCS,
            is_ts=fname in _TS_FUNCS,
            is_variant=fname == "parse_json"
            and len(args) == 1
            and "schema" not in kwargs,
            err_msg=err_msg,
            # `array!(.x)` asserts an array — propagate that static type
            # so closure targets (filter.cue style) are recognized
            dtype="array" if fname == "array"
            else (args[0].dtype if fname == "object" and args else None),
        )


def compile_program(
    source: str,
    columns: set[str] | dict[str, str] | None = None,
    enrichment_tables: dict[str, list[dict]] | None = None,
) -> CompiledProgram:
    """Compile VRL source to order-independent assignments + conditions.

    ``columns`` (the input schema's top-level names) lets reads of absent
    fields resolve to NULL like VRL's missing-path semantics; without it
    every path is assumed to be a real column."""
    c = _Compiler(_tokenize(source), columns)
    if enrichment_tables:
        c.enrichment_tables = enrichment_tables
    c.compile()
    if c.peek()[0] != "eof":
        raise VrlCompileError(f"trailing tokens: {c.toks[c.i:c.i + 4]}")

    def _any(conds: list[Column]) -> Column | None:
        if not conds:
            return None
        out = conds[0]
        for x in conds[1:]:
            out = out | x
        return out

    # nested write targets (`.a.b = …`) materialize as struct roots.
    # Limitation (documented): writing `.a.b` REPLACES column `a` with a
    # struct of exactly the written leaves — merge-into-existing-struct
    # would need the input schema's field list at compile time.
    flat = {k: v for k, v in c.env.items() if SEP not in k}
    nested: dict[str, dict[str, Column]] = {}
    for k, v in c.env.items():
        if SEP in k:
            root, rest = k.split(SEP, 1)
            nested.setdefault(root, {})[rest] = v

    def _build_struct(leaves: dict[str, Column]) -> Column:
        direct, sub = {}, {}
        for k, v in leaves.items():
            if SEP in k:
                r, rest = k.split(SEP, 1)
                sub.setdefault(r, {})[rest] = v
            else:
                direct[k] = v
        return F.struct(
            *[v.alias(k) for k, v in direct.items()],
            *[_build_struct(s).alias(r) for r, s in sub.items()],
        )

    for root, leaves in nested.items():
        if root in flat:
            raise VrlCompileError(
                f"mixed whole-field and nested writes to {root!r}"
            )
        flat[root] = _build_struct(leaves)

    return CompiledProgram(
        assignments=flat,
        drops=sorted(c.dropped),
        abort_when=_any(c.aborts),
        error_when=_any(c.errors),
        root=c.root,
    )


def compile_expression(
    source: str, columns: set[str] | dict[str, str] | None = None
) -> Column:
    """Compile a VRL condition *program* to a Column: optional local
    variable bindings (``x = …``), then newline-separated expressions with
    VRL block semantics (the LAST expression is the value). Event mutation
    is rejected — conditions must not write fields (conditions/mod.rs)."""
    c = _Compiler(_tokenize(source), columns)

    def _at_var_assign() -> bool:
        return (
            c.peek()[0] == "word"
            and c.toks[c.i + 1][1] == "="
            and c.peek()[1] not in ("if", "true", "false", "null")
        )

    def _is_assert() -> bool:
        return c.peek()[0] == "word" and c.peek()[1].rstrip("!") in (
            "assert",
            "assert_eq",
        )

    constraints: list[Column] = []
    v: _Val | None = None
    first = True
    while c.peek()[0] != "eof" and (first or c.peek_nl()):
        first = False
        if _at_var_assign():
            name = c.next()[1]
            c.expect("=")
            c.vars[name] = c.expr()
            continue
        if _is_assert():
            # assert/assert_eq RAISE on failure — in a condition program
            # every assertion is a conjunct, whatever the final value
            constraints.append(c.expr().col)
            continue
        # a VRL block evaluates to its LAST expression — earlier
        # newline-separated expressions are evaluated and discarded
        v = c.expr()
    if c.peek()[0] != "eof":
        raise VrlCompileError(f"trailing tokens: {c.toks[c.i:c.i + 4]}")
    out = v.col if v is not None else None
    for con in constraints:
        out = con if out is None else (out & con)
    if out is None:
        raise VrlCompileError("empty condition program")
    return out


def remap_program(
    df: DataFrame,
    source: str,
    enrichment_tables: dict[str, list[dict]] | None = None,
    **remap_kwargs,
) -> dict[str, DataFrame]:
    """Run a VRL program through the remap transform (reference
    remap.rs:100-118 ``source`` config key). ``enrichment_tables`` supplies
    broadcastable dim rows for get/find_enrichment_table_records."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from vector_spark.operators.remap import remap

    prog = compile_program(
        source, columns=dict(df.dtypes), enrichment_tables=enrichment_tables
    )
    if prog.root is not None:
        # event replacement: split first (conditions are closed over the
        # ORIGINAL columns), then expand the new root
        drop_on_error = remap_kwargs.get("drop_on_error", True)
        drop_on_abort = remap_kwargs.get("drop_on_abort", True)
        reroute = remap_kwargs.get("reroute_dropped", True)
        gone = None
        if prog.error_when is not None and drop_on_error:
            gone = F.coalesce(prog.error_when, F.lit(False))
        if prog.abort_when is not None and drop_on_abort:
            a = F.coalesce(prog.abort_when, F.lit(False))
            gone = a if gone is None else (gone | a)
        keep, dropped = df, None
        if gone is not None:
            keep = df.filter(~gone)
            if reroute:
                dropped = df.filter(gone).withColumn(
                    "metadata_dropped",
                    F.struct(
                        F.lit("error").alias("reason"),
                        F.lit("program failed").alias("message"),
                        F.lit(
                            remap_kwargs.get("component_id", "remap")
                        ).alias("component_id"),
                    ),
                )
        dt = df.select(prog.root.alias("__r")).schema[0].dataType
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            prim = keep.select(F.explode(prog.root).alias("__r")).select("__r.*")
        elif isinstance(dt, StructType):
            names = [f.name for f in dt.fields]
            sel = [
                (
                    prog.assignments[n]
                    if n in prog.assignments
                    else prog.root.getField(n)
                ).alias(n)
                for n in names
                if n not in prog.drops
            ]
            sel += [
                c.alias(n)
                for n, c in prog.assignments.items()
                if n not in names
            ]
            prim = keep.select(*sel)
        elif isinstance(dt, MapType):
            # dynamic-keyed object root (e.g. `. = parse_key_value!(…)`,
            # remap.rs:591-596): keys are data-dependent, so the event
            # becomes the single-`message`-variant convention — readers
            # (compile_expression) navigate into it like any variant root
            prim = keep.select(
                F.try_parse_json(F.to_json(prog.root)).alias("message"),
                *[c.alias(n) for n, c in prog.assignments.items()],
            )
        else:  # scalar root becomes {message: value} (remap.rs:591-596)
            prim = keep.select(
                prog.root.alias("message"),
                *[c.alias(n) for n, c in prog.assignments.items()],
            )
        outs = {"primary": prim}
        if dropped is not None:
            outs["dropped"] = dropped
        return outs

    outs = remap(
        df,
        prog.assignments,
        error_when=prog.error_when,
        abort_when=prog.abort_when,
        simultaneous=True,
        **remap_kwargs,
    )
    if prog.drops:
        outs = {
            k: v.drop(*[d for d in prog.drops if d in v.columns])
            for k, v in outs.items()
        }
    return outs
