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

Out of scope (loud ``VrlCompileError``, never silent): closures
(``for_each``), dynamic paths, ``.`` root assignment (use
``remap_explode``), functions absent from the registry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class VrlCompileError(ValueError):
    pass


# --- tokenizer ---------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*)
      | (?P<op>\?\?|\|\||&&|==|!=|>=|<=|>|<|[=!(){}\[\],:;+\-*/%])
      | (?P<path>\.[A-Za-z_][A-Za-z0-9_.]*|\.)
      | (?P<str>\"\"\"(?:[^\\]|\\.)*?\"\"\"|"(?:[^"\\]|\\.)*"|r'(?:[^'\\]|\\.)*'|'(?:[^'\\]|\\.)*')
      | (?P<num>\d+\.\d+|\d+)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*!?)
    )""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str, bool]]:
    """Tokens are ``(kind, value, newline_before)`` — VRL statements are
    newline-terminated, so postfix member access must not cross a newline
    (``f(.a)\\n.b = …`` is two statements, not ``f(.a).b``)."""
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
            out.append((kind, m.group(kind), nl))
    out.append(("eof", "", True))
    return out


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


def _v(x: _Val) -> object:
    if not x.has_lit:
        raise VrlCompileError(
            "this argument must be a literal (the Spark builder needs a "
            "plan-time constant, e.g. a format string or regex)"
        )
    return x.lit


def _lit(value: object) -> _Val:
    return _Val(F.lit(value), value, True)


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

    def is_nullish(a, k):
        # VRL is_nullish: null, "", "-", whitespace-only (is_nullish.cue)
        c = a[0].col
        t = F.trim(c.cast("string"))
        return c.isNull() | (t == "") | (t == "-")

    def parse_ts(a, k):
        fmt = k.get("format") or (a[1] if len(a) > 1 else None)
        java = strftime_to_java(_v(fmt)) if fmt is not None else None
        return parse.parse_timestamp(a[0].col, java)

    def format_ts(a, k):
        fmt = k.get("format") or a[1]
        return F.date_format(a[0].col, strftime_to_java(_v(fmt)))

    def to_unix(a, k):
        unit = _v(k["unit"]) if "unit" in k else (_v(a[1]) if len(a) > 1 else "seconds")
        secs = a[0].col.cast("double")
        scale = {"seconds": 1, "milliseconds": 1e3, "nanoseconds": 1e9}[unit]
        return (secs * scale).cast("long")

    def slice_(a, k):
        end = _v(a[2]) if len(a) > 2 else (_v(k["end"]) if "end" in k else None)
        return strings.slice_(a[0].col, _v(a[1]), end)

    def redact(a, k):
        pats = _v(k["filters"]) if "filters" in k else _v(a[1])
        return strings.redact(a[0].col, list(pats))

    def trunc(a, k):
        suffix = "..." if k.get("suffix") and _v(k["suffix"]) else ""
        return strings.truncate(a[0].col, _v(a[1]), suffix)

    def repl(a, k):
        return strings.replace(a[0].col, _v(a[1]), _v(a[2]))

    def parse_json(a, k):
        # open-object form → map<string,string>; pass schema for typed
        if len(a) > 1 or "schema" in k:
            sch = _v(k["schema"]) if "schema" in k else _v(a[1])
            return parse.parse_json(a[0].col, sch)
        return parse.parse_json_map(a[0].col)

    def ip_cidr(a, k):
        return ip.ip_cidr_contains(_v(a[0]), a[1].col)

    def length(a, k):
        return F.length(a[0].col)

    def rnd(a, k):
        p = _v(a[1]) if len(a) > 1 else (_v(k["precision"]) if "precision" in k else 0)
        return F.round(a[0].col, p)

    def sha2(a, k):
        var = _v(k["variant"]) if "variant" in k else (_v(a[1]) if len(a) > 1 else 256)
        return crypto.sha2(a[0].col, int(str(var).lstrip("SHA-")))

    def sha3(a, k):
        var = _v(k["variant"]) if "variant" in k else (_v(a[1]) if len(a) > 1 else 512)
        return crypto.sha3(a[0].col, int(str(var).replace("SHA3-", "")))

    def split(a, k):
        lim = _v(a[2]) if len(a) > 2 else -1
        return F.split(a[0].col, _v(a[1]), lim)

    def tag_types_externally(a, k):
        # reference tags scalars for external JSON; column types already
        # carry this — identity on a typed engine
        return a[0].col

    reg: dict[str, object] = {
        # type conversion (remap/functions/to_*.cue)
        "string": lambda a, k: a[0].col.cast("string"),
        "to_string": lambda a, k: a[0].col.cast("string"),
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
        "contains": lambda a, k: a[0].col.contains(a[1].col),
        "starts_with": lambda a, k: strings.starts_with(a[0].col, _v(a[1])),
        "ends_with": lambda a, k: strings.ends_with(a[0].col, _v(a[1])),
        "find": lambda a, k: strings.find(a[0].col, _v(a[1])),
        "match": lambda a, k: F.regexp_like(a[0].col, F.lit(_v(a[1]))),
        # numbers
        "round": rnd,
        "floor": lambda a, k: F.floor(a[0].col),
        "ceil": lambda a, k: F.ceil(a[0].col),
        "abs": lambda a, k: F.abs(a[0].col),
        "mod": lambda a, k: a[0].col % a[1].col,
        # checks
        "exists": lambda a, k: a[0].col.isNotNull(),
        "is_null": lambda a, k: a[0].col.isNull(),
        "is_nullish": is_nullish,
        "is_empty": lambda a, k: F.length(a[0].col) == 0,
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
        "uuid_v7": lambda a, k: crypto.uuid_v7(),
        # parse family
        "parse_json": parse_json,
        "parse_timestamp": parse_ts,
        "format_timestamp": format_ts,
        "to_unix_timestamp": to_unix,
        "from_unix_timestamp": lambda a, k: F.timestamp_seconds(a[0].col),
        "parse_int": lambda a, k: parse.parse_int(a[0].col),
        "parse_float": lambda a, k: parse.parse_float(a[0].col),
        "parse_duration": lambda a, k: parse.parse_duration(
            a[0].col, _v(a[1]) if len(a) > 1 else "s"
        ),
        "parse_key_value": lambda a, k: parse.parse_key_value(a[0].col),
        "parse_query_string": lambda a, k: parse.parse_query_string(a[0].col),
        "parse_url": lambda a, k: parse.parse_url(a[0].col),
        "parse_common_log": lambda a, k: parse.parse_common_log(a[0].col),
        "parse_apache_log": lambda a, k: parse.parse_apache_log(
            a[0].col, _v(k["format"]) if "format" in k else "common"
        ),
        "parse_syslog": lambda a, k: parse.parse_syslog(a[0].col),
        "parse_glog": lambda a, k: parse.parse_glog(a[0].col),
        "parse_regex": lambda a, k: parse.parse_regex(
            a[0].col, _v(a[1]), _v(k["fields"]) if "fields" in k else None
        ),
        # ip
        "ip_subnet": lambda a, k: ip.ip_subnet(a[0].col, _v(a[1])),
        "ip_cidr_contains": ip_cidr,
        "ip_aton": lambda a, k: ip.ip_aton(a[0].col),
        "ip_ntoa": lambda a, k: ip.ip_ntoa(a[0].col),
        # syslog
        "to_syslog_facility": lambda a, k: syslog.to_syslog_facility(a[0].col),
        "to_syslog_level": lambda a, k: syslog.to_syslog_level(a[0].col),
        "to_syslog_severity": lambda a, k: syslog.to_syslog_severity(a[0].col),
        # objects / arrays
        "merge": lambda a, k: objects.merge_maps(a[0].col, a[1].col),
        "flatten": lambda a, k: F.flatten(a[0].col),
        "push": lambda a, k: F.array_append(a[0].col, a[1].col),
        "includes": lambda a, k: F.array_contains(a[0].col, a[1].col),
        "unique": lambda a, k: F.array_distinct(a[0].col),
        "compact": lambda a, k: F.filter(a[0].col, lambda x: x.isNotNull()),
        # misc
        "tag_types_externally": tag_types_externally,
        "now": lambda a, k: F.current_timestamp(),
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
    ``remap(..., simultaneous=True)`` or :func:`remap_program`."""

    assignments: dict[str, Column]
    drops: list[str]
    abort_when: Column | None
    error_when: Column | None


class _Compiler:
    def __init__(
        self,
        tokens: list[tuple[str, str, bool]],
        columns: set[str] | None = None,
    ):
        self.toks = tokens
        self.i = 0
        self.columns = columns
        self.env: dict[str, Column] = {}
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
    # semantics by substitution)
    def read(self, path: str) -> Column:
        if path in self.env:
            return self.env[path]
        if path in self.dropped:
            return F.lit(None)
        parts = path.split(".")
        if self.columns is not None and parts[0] not in self.columns:
            # missing field reads as null (VRL missing-path semantics)
            return F.lit(None)
        col = F.col(parts[0])
        for p in parts[1:]:
            col = col.getItem(p)
        return col

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
            self.expect(")")
            path = p[1:]
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
        if kind == "path":
            self.next()
            if val == ".":
                raise VrlCompileError(
                    "root assignment '. = …' is remap_explode territory"
                )
            self.expect("=")
            rhs = self.expr()
            path = val[1:]
            for f in rhs.fallible:
                self.errors.append(
                    (guard & f.isNull()) if guard is not None else f.isNull()
                )
            new = rhs.col
            if guard is not None:
                new = F.when(guard, new).otherwise(self.read(path))
            self.env[path] = new
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
            if op == "+" and (
                (c.has_lit and isinstance(c.lit, str))
                or (r.has_lit and isinstance(r.lit, str))
            ):
                col = F.concat(c.col.cast("string"), r.col.cast("string"))
            else:
                col = c.col + r.col if op == "+" else c.col - r.col
            c = _Val(col, fallible=c.fallible + r.fallible)
        return c

    def mul(self) -> _Val:
        c = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            r = self.unary()
            col = {"*": c.col * r.col, "/": c.col / r.col, "%": c.col % r.col}[op]
            c = _Val(col, fallible=c.fallible + r.fallible)
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
                col = v.col
                for p in val[1:].split("."):
                    col = col.getItem(p)
                v = _Val(col, fallible=v.fallible)
            elif val == "[":
                self.next()
                idx = self.expr()
                self.expect("]")
                v = _Val(
                    v.col.getItem(_v(idx)), fallible=v.fallible + idx.fallible
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
            if all(i.has_lit for i in items):
                return _lit([i.lit for i in items])
            return _Val(F.array(*[i.col for i in items]))
        if kind == "path":
            return _Val(self.read(val[1:]) if val != "." else F.lit(None))
        if kind == "str":
            return _lit(_unquote(val))
        if kind == "num":
            return _lit(float(val) if "." in val else int(val))
        if kind == "word":
            if val in ("true", "false"):
                return _lit(val == "true")
            if val == "null":
                return _Val(F.lit(None))
            if self.peek()[1] == "(":
                return self.call(val)
            raise VrlCompileError(f"unknown identifier {val!r}")
        raise VrlCompileError(f"unexpected token {val!r}")

    def call(self, name: str) -> _Val:
        fallible_assert = name.endswith("!")
        fname = name.rstrip("!")
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
        if "value" in kwargs:  # VRL's universal first-argument name
            args.insert(0, kwargs.pop("value"))
        col = _lookup(fname)(args, kwargs)
        inherited = [f for a in [*args, *kwargs.values()] for f in a.fallible]
        return _Val(col, fallible=inherited + ([col] if fallible_assert else []))


def compile_program(
    source: str, columns: set[str] | None = None
) -> CompiledProgram:
    """Compile VRL source to order-independent assignments + conditions.

    ``columns`` (the input schema's top-level names) lets reads of absent
    fields resolve to NULL like VRL's missing-path semantics; without it
    every path is assumed to be a real column."""
    c = _Compiler(_tokenize(source), columns)
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

    return CompiledProgram(
        assignments=dict(c.env),
        drops=sorted(c.dropped),
        abort_when=_any(c.aborts),
        error_when=_any(c.errors),
    )


def remap_program(df: DataFrame, source: str, **remap_kwargs) -> dict[str, DataFrame]:
    """Run a VRL program through the remap transform (reference
    remap.rs:100-118 ``source`` config key)."""
    from vector_spark.operators.remap import remap

    prog = compile_program(source, columns=set(df.columns))
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
