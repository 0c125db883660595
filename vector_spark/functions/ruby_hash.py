"""parse_ruby_hash: Ruby hash literal → JSON string (object), vectorized.

Parity: VRL's ``parse_ruby_hash`` (website/cue/reference/remap/functions/
parse_ruby_hash.cue) — parses ``{ "key" => value }`` payloads that Ruby
services (Rails logs, Fluentd in_tail of Ruby apps) emit instead of JSON.

This is a real recursive-descent parser, not a regex→JSON rewrite: quoted
strings may contain ``=>``, ``nil``, braces, or escapes, which any
substitution hack corrupts (the reason this function was previously marked
OUT-OF-SCOPE in FUNCTIONS.md). Grammar:

    value  := hash | array | string | number | true | false | nil
    hash   := '{' (key '=>' value) % ',' '}'
    key    := string | ':' bareword          (symbol keys become strings)
    array  := '[' value % ',' ']'
    string := '"' (escapes) '"' | "'" ('\\'' and '\\\\' escapes) "'"

Runs inside an Arrow-batched pandas UDF (the repo-wide rule: Python only
via vectorized UDFs, never row-at-a-time PythonUDF in a JVM expression).
The result is a canonical JSON string; downstream extraction stays JVM-side
(``get_json_object`` / ``from_json``). Invalid payloads yield NULL, matching
the module contract of ``functions/parse.py`` (misses yield nulls).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_WS = " \t\r\n"
_DQ_ESCAPES = {
    '"': '"', "\\": "\\", "/": "/", "n": "\n", "t": "\t", "r": "\r",
    "b": "\b", "f": "\f", "a": "\x07", "e": "\x1b", "0": "\x00",
    "s": " ", "'": "'",
}


class _RubyHashError(ValueError):
    pass


class _Parser:
    __slots__ = ("s", "i", "n")

    def __init__(self, s: str) -> None:
        self.s = s
        self.i = 0
        self.n = len(s)

    def fail(self, msg: str) -> None:
        raise _RubyHashError(f"{msg} at offset {self.i}")

    def skip_ws(self) -> None:
        while self.i < self.n and self.s[self.i] in _WS:
            self.i += 1

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            self.fail(f"expected {ch!r}")
        self.i += 1

    # --- terminals ---------------------------------------------------------

    def parse_string(self) -> str:
        quote = self.peek()
        self.i += 1
        out: list[str] = []
        while True:
            if self.i >= self.n:
                self.fail("unterminated string")
            c = self.s[self.i]
            if c == quote:
                self.i += 1
                return "".join(out)
            if c == "\\":
                if self.i + 1 >= self.n:
                    self.fail("dangling escape")
                e = self.s[self.i + 1]
                if quote == "'":
                    # single-quoted Ruby strings only escape \' and \\
                    if e in ("'", "\\"):
                        out.append(e)
                    else:
                        out.append("\\")
                        out.append(e)
                elif e == "u" and self.i + 5 < self.n:
                    out.append(chr(int(self.s[self.i + 2 : self.i + 6], 16)))
                    self.i += 6
                    continue
                else:
                    out.append(_DQ_ESCAPES.get(e, e))
                self.i += 2
            else:
                out.append(c)
                self.i += 1

    def parse_number(self) -> int | float:
        start = self.i
        if self.peek() in "+-":
            self.i += 1
        saw_digit = saw_dot = saw_exp = False
        while self.i < self.n:
            c = self.s[self.i]
            if c.isdigit() or c == "_":
                saw_digit = True
            elif c == "." and not saw_dot and not saw_exp:
                saw_dot = True
            elif c in "eE" and saw_digit and not saw_exp:
                saw_exp = True
                if self.i + 1 < self.n and self.s[self.i + 1] in "+-":
                    self.i += 1
            else:
                break
            self.i += 1
        text = self.s[start : self.i].replace("_", "")
        if not saw_digit:
            self.fail("invalid number")
        return float(text) if (saw_dot or saw_exp) else int(text)

    def parse_bareword(self) -> str:
        start = self.i
        while self.i < self.n and (self.s[self.i].isalnum() or self.s[self.i] == "_"):
            self.i += 1
        if self.i == start:
            self.fail("expected identifier")
        return self.s[start : self.i]

    # --- composites --------------------------------------------------------

    def parse_key(self) -> str:
        c = self.peek()
        if c in "\"'":
            return self.parse_string()
        if c == ":":
            self.i += 1
            return self.parse_bareword()
        self.fail("expected hash key")
        raise AssertionError  # unreachable

    def parse_hash(self) -> dict:
        self.expect("{")
        out: dict = {}
        self.skip_ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.skip_ws()
            key = self.parse_key()
            self.skip_ws()
            if self.s[self.i : self.i + 2] != "=>":
                self.fail("expected '=>'")
            self.i += 2
            self.skip_ws()
            out[key] = self.parse_value()
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.i += 1
                continue
            if c == "}":
                self.i += 1
                return out
            self.fail("expected ',' or '}'")

    def parse_array(self) -> list:
        self.expect("[")
        out: list = []
        self.skip_ws()
        if self.peek() == "]":
            self.i += 1
            return out
        while True:
            self.skip_ws()
            out.append(self.parse_value())
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.i += 1
                continue
            if c == "]":
                self.i += 1
                return out
            self.fail("expected ',' or ']'")

    def parse_value(self):
        c = self.peek()
        if c == "{":
            return self.parse_hash()
        if c == "[":
            return self.parse_array()
        if c in "\"'":
            return self.parse_string()
        if c.isdigit() or c in "+-":
            return self.parse_number()
        word = self.parse_bareword()
        if word == "true":
            return True
        if word == "false":
            return False
        if word == "nil":
            return None
        self.fail(f"unexpected token {word!r}")
        raise AssertionError  # unreachable


def parse_ruby_hash_str(s: str) -> str | None:
    """One payload → canonical JSON string, or None if not a valid hash."""
    try:
        p = _Parser(s)
        p.skip_ws()
        obj = p.parse_hash()
        p.skip_ws()
        if p.i != p.n:
            return None  # trailing garbage
        return json.dumps(obj, ensure_ascii=False, separators=(",", ":"))
    except (_RubyHashError, ValueError, IndexError):
        return None


def parse_ruby_hash(col: Column) -> Column:
    """Column of Ruby-hash strings → column of JSON strings (null on miss)."""

    @pandas_udf("string")
    def _parse(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else parse_ruby_hash_str(str(v)))

    return _parse(col)
