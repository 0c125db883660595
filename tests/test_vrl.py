"""VRL program compiler tests — reference tests/behavior/transforms/remap.toml
cases re-expressed through compile_program/remap_program (the `source` config
key of the remap transform, remap.rs:100-118)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.vrl import (
    VrlCompileError,
    compile_expression,
    compile_program,
    remap_program,
    strftime_to_java,
)


def _one(spark, **fields):
    cols = ", ".join(
        f"{k} {'string' if isinstance(v, str) else 'long' if isinstance(v, int) else 'double'}"
        for k, v in fields.items()
    )
    return spark.createDataFrame([tuple(fields.values())], cols)


# --- corpus: remap_source ----------------------------------------------------
def test_simple_assignment(spark):
    df = _one(spark, foo="x")
    out = remap_program(df, '.message = "foo"')["primary"].collect()[0]
    assert out.message == "foo" and out.foo == "x"


# --- corpus: remap_error_coalesce_operator -----------------------------------
def test_error_coalesce(spark):
    df = _one(spark, raw="")
    src = """
      .val1 = parse_json("{ INVALID }") ?? "nope"
    """
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.val1 == "nope"


# --- corpus: remap_bang_function — error terminates the program --------------
def test_bang_function_errors_and_drops(spark):
    df = _one(spark, raw="x")
    outs = remap_program(
        df,
        '.val = parse_json!("{ INVALID }")',
        drop_on_error=True,
        reroute_dropped=True,
    )
    assert outs["primary"].count() == 0
    bad = outs["dropped"].collect()
    assert len(bad) == 1 and bad[0].metadata_dropped.reason == "error"


# --- corpus: remap_function_arguments (value: named arg) ---------------------
def test_named_value_argument(spark):
    df = _one(spark, n=10)
    src = """
      .a = to_string(.n)
      .b = to_string(value: .n)
    """
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.a == "10" and out.b == "10"


# --- corpus: remap_function_upcase + guarded assignment ----------------------
def test_upcase_and_if(spark):
    df = spark.createDataFrame([("a", "f"), ("b", "g")], "a string, f string")
    src = """
      .a = upcase(string!(.a))
      if upcase(string!(.f)) == "F" {
        .f = "ff"
      }
    """
    rows = remap_program(df, src)["primary"].orderBy("a").collect()
    assert [(r.a, r.f) for r in rows] == [("A", "ff"), ("B", "g")]


# --- corpus: remap_abort (drop_on_abort=false → original forwarded) ----------
def test_abort_reverts(spark):
    df = spark.createDataFrame([("keep",), ("zap",)], "tag string")
    src = """
      .touched = "yes"
      if .tag == "zap" {
        abort
      }
    """
    rows = {
        r.tag: r
        for r in remap_program(df, src, drop_on_abort=False, reroute_dropped=False)[
            "primary"
        ].collect()
    }
    assert rows["keep"].touched == "yes"
    assert rows["zap"].touched is None  # reverted


# --- sequential semantics by substitution ------------------------------------
def test_sequential_reads_see_prior_writes(spark):
    df = _one(spark, a=1)
    src = """
      .a = .a + 1
      .b = .a * 10
    """
    out = remap_program(df, src)["primary"].collect()[0]
    assert (out.a, out.b) == (2, 20)


def test_del_and_guarded_del(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    out = remap_program(df, "del(.b)")["primary"]
    assert out.columns == ["a", "c"]
    # guarded del nulls, keeps the column (row-dependent presence)
    out2 = remap_program(df, "if .a == 1 { del(.c) }")["primary"].collect()[0]
    assert out2.c is None


def test_if_else_chain(spark):
    df = spark.createDataFrame([(50,), (150,), (250,)], "ms long")
    src = """
      if .ms < 100 { .speed = "fast" }
      else if .ms < 200 { .speed = "ok" }
      else { .speed = "slow" }
    """
    rows = remap_program(df, src)["primary"].orderBy("ms").collect()
    assert [r.speed for r in rows] == ["fast", "ok", "slow"]


def test_string_concat_and_arithmetic(spark):
    df = _one(spark, host="web1", n=4)
    src = """
      .fqdn = .host + ".example.com"
      .half = .n / 2
    """
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.fqdn == "web1.example.com" and out.half == 2.0


def test_parse_timestamp_strftime(spark):
    df = _one(spark, ts="10/Oct/2000:13:55:36 -0700")
    src = '.when = parse_timestamp!(.ts, format: "%d/%b/%Y:%H:%M:%S %z")'
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.when.year == 2000 and out.when.month == 10


def test_strftime_translation():
    assert strftime_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    assert strftime_to_java("%d/%b/%Y:%H:%M:%S %z") == "dd/MMM/yyyy:HH:mm:ss xx"
    with pytest.raises(VrlCompileError):
        strftime_to_java("%Q")


def test_is_nullish_and_exists(spark):
    df = spark.createDataFrame([("-",), ("x",), (None,)], "v string")
    src = ".bad = is_nullish(.v)"
    rows = remap_program(df, src)["primary"].collect()
    got = {r.v: r.bad for r in rows}
    assert got == {"-": True, "x": False, None: True}


def test_json_field_access(spark):
    df = _one(spark, msg='{"user": "bob", "n": "7"}')
    src = """
      .user = string!(parse_json!(.msg).user)
      .n = to_int!(parse_json!(.msg).n)
    """
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.user == "bob" and out.n == 7


def test_is_type_family(spark):
    # is_*.cue family over dynamic JSON (variant) and typed columns
    df = _one(spark, j='{"s":"x","i":7,"f":1.5,"b":true,"a":[1],"o":{"k":1}}')
    src = """
      .v = parse_json!(.j)
      .s_ok = is_string(.v.s)
      .i_ok = is_integer(.v.i)
      .f_ok = is_float(.v.f)
      .b_ok = is_boolean(.v.b)
      .a_ok = is_array(.v.a)
      .o_ok = is_object(.v.o)
      .wrong = is_string(.v.i)
      .col_str = is_string(.j)
      .ts_ok = is_timestamp(now())
    """
    r = remap_program(df, src)["primary"].collect()[0]
    assert r.s_ok and r.i_ok and r.f_ok and r.b_ok and r.a_ok and r.o_ok
    assert not r.wrong
    assert r.col_str and r.ts_ok


def test_match_datadog_query(spark):
    # the LAST of the 180 documented VRL functions: the datadog-search
    # predicate language callable from VRL (match_datadog_query.cue)
    df = spark.createDataFrame(
        [("web prod error",), ("db dev ok",)], "message string"
    )
    out = remap_program(df, '.hit = match_datadog_query(., "error")')[
        "primary"
    ].collect()
    assert {(r.message, r.hit) for r in out} == {
        ("web prod error", True),
        ("db dev ok", False),
    }


def test_unknown_function_is_loud():
    with pytest.raises(VrlCompileError, match="not in the compiler registry"):
        compile_program(".x = frobnicate(.y)")


def test_root_assignment_array_explodes(spark):
    # remap.toml remap_emit_multiple: `. = [{…}, {…}]` → one event per elem
    df = spark.createDataFrame([("x",)], "raw string")
    src = '. = [{"message": "hello"}, {"message": "world"}]'
    rows = remap_program(df, src)["primary"].collect()
    assert sorted(r.message for r in rows) == ["hello", "world"]
    assert rows[0].asDict().keys() == {"message"}  # old event replaced


def test_root_assignment_scalar_becomes_message(spark):
    # remap.toml remap_mapped_scalars: `. = 5` → {message: 5}
    df = spark.createDataFrame([("x",)], "raw string")
    rows = remap_program(df, ". = 5")["primary"].collect()
    assert rows[0].message == 5 and "raw" not in rows[0].asDict()


def test_root_assignment_struct_with_post_statements(spark):
    # remap.toml remap_function_parse_regex shape: replace the event with a
    # parsed struct, then mutate fields of the NEW root
    df = spark.createDataFrame([("bob 42",)], "message string")
    src = r"""
      . = parse_regex!(.message, r'^(?P<user>\w+) (?P<n>\d+)$')
      .n = to_int!(.n)
    """
    rows = remap_program(df, src)["primary"].collect()
    assert rows[0].user == "bob" and rows[0].n == 42
    assert "message" not in rows[0].asDict()


def test_compiled_program_shape():
    prog = compile_program(
        """
        # a comment
        .sev = to_syslog_severity!(.level)
        if .sev > 5 { abort }
        del(.level)
        """
    )
    assert set(prog.assignments) == {"sev"}
    assert prog.drops == ["level"]
    assert prog.abort_when is not None and prog.error_when is not None


def test_vrl_test_file_format(spark):
    """The `vrl test` fixture format (lib/vector-vrl/tests/tests/*.vrl):
    `# object:` input event, `# result:` expected output, program body,
    trailing `.` returns the event. Runs the vendored example verbatim."""
    import json
    from pathlib import Path

    p = Path("/root/reference/lib/vector-vrl/tests/tests/example.vrl")
    if not p.exists():
        pytest.skip("reference corpus unavailable")
    text = p.read_text()
    obj = result = None
    body_lines = []
    for line in text.splitlines():
        if line.startswith("# object:"):
            obj = json.loads(line.split(":", 1)[1])
        elif line.startswith("# result:"):
            result = json.loads(line.split(":", 1)[1])
        elif not line.startswith("#"):
            body_lines.append(line)
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(**obj)])
    out = remap_program(df, "\n".join(body_lines))["primary"].collect()[0]
    got = out.asDict()
    assert got == result, got


def test_serde_json_error_emulator():
    # pinned against serde_json's de-facto message format (the reference's
    # parse_json surfaces these verbatim — remap.toml:311-329)
    from vector_spark.vrl import _serde_json_error as E

    assert E("{ INVALID }") == "key must be a string at line 1 column 3"
    assert E("") == "EOF while parsing a value at line 1 column 0"
    assert E("{") == "EOF while parsing an object at line 1 column 1"
    assert E("[1,") == "EOF while parsing a list at line 1 column 3"
    assert E("01") == "trailing characters at line 1 column 2"
    assert E('{"a":1,}') == "trailing comma at line 1 column 8"
    assert E('"abc') == "EOF while parsing a string at line 1 column 4"
    assert E("nope") == "expected value at line 1 column 1"
    for ok in ("true", "null", "-1.5e3", '[1,{"a":null},"s"]', '{ "x": [] }'):
        assert E(ok) is None, ok


def test_error_capture_carries_message(spark):
    # remap.toml remap_infallible_assignment: `.nope, .err1 = parse_json(…)`
    # puts the reference's full error text (with the call's byte span) in
    # the error slot on failure, null on success
    df = spark.createDataFrame([("",)], "message string")
    src = '.nope, .err1 = parse_json("{ BAD }")\n.ok, .err2 = parse_json("7")'
    row = remap_program(df, src)["primary"].collect()[0]
    assert row.nope is None and row.err2 is None and str(row.ok) == "7"
    assert row.err1 == (
        'function call error for "parse_json" at (15:36): '
        "unable to parse json: key must be a string at line 1 column 3"
    )


def test_parse_key_value_reference_semantics(spark):
    # parse_key_value.cue: trim, strip quotes, standalone keys, first-win
    # duplicates, delimiter runs collapse
    from tests.test_functions import one
    import vector_spark.functions.parse as P

    m = '  a=1   b="two words" standalone a=9  \n'
    r = one(spark, P.parse_key_value(F.col("m")), m=m)
    assert r == {"a": "1", "b": "two words", "standalone": ""}


def test_map_root_replacement_event(spark):
    # remap.toml remap_function_parse_key_value: `. = parse_key_value!(…)`
    # (dynamic keys) → single-`message`-variant event; compile_expression
    # paths navigate into it
    df = spark.createDataFrame([("path=/x status=304",)], "message string")
    out = remap_program(
        df, '. = parse_key_value!(.message, key_value_delimiter: "=", field_delimiter: " ")'
    )["primary"]
    assert out.columns == ["message"]
    cond = compile_expression(
        '.path == "/x" && .status == "304"', dict(out.dtypes)
    )
    assert out.filter(F.coalesce(cond, F.lit(False))).count() == 1


# --- closures (for_each.cue / filter.cue / map_keys.cue / map_values.cue) ----
def _coll(spark):
    return spark.createDataFrame(
        [(["foo", "bar", "foo", "baz"], {"a": "x", "b": "y"})],
        "tags array<string>, attrs map<string,string>",
    )


def test_closure_filter_array_cue_example(spark):
    # filter.cue: keep any elements that aren't equal to "foo"
    out = remap_program(
        _coll(spark),
        '.kept = filter(array!(.tags)) -> |_index, value| { value != "foo" }',
    )["primary"].collect()[0]
    assert out.kept == ["bar", "baz"]


def test_closure_filter_array_index_param(spark):
    out = remap_program(
        _coll(spark), ".evens = filter(array!(.tags)) -> |i, v| { i % 2 == 0 }"
    )["primary"].collect()[0]
    assert out.evens == ["foo", "foo"]  # 0-based indices 0 and 2


def test_closure_map_values_array_and_map(spark):
    out = remap_program(
        _coll(spark),
        ".t2 = map_values(array!(.tags)) -> |v| { upcase(v) }\n"
        ".up = map_values(.attrs) -> |value| { upcase(value) }",
    )["primary"].collect()[0]
    assert out.t2 == ["FOO", "BAR", "FOO", "BAZ"]
    assert dict(out.up) == {"a": "X", "b": "Y"}


def test_closure_map_keys_cue_example(spark):
    # map_keys.cue: upcase the keys
    out = remap_program(
        _coll(spark), ".uk = map_keys(.attrs) -> |key| { upcase(key) }"
    )["primary"].collect()[0]
    assert dict(out.uk) == {"A": "x", "B": "y"}


def test_closure_map_filter(spark):
    out = remap_program(
        _coll(spark), '.kept = filter(.attrs) -> |k, v| { k == "a" }'
    )["primary"].collect()[0]
    assert dict(out.kept) == {"a": "x"}


def test_closure_for_each_scalar_accumulators(spark):
    src = """
count = 0
chars = 0
for_each(array!(.tags)) -> |_index, value| {
  count = count + 1
  chars = chars + length(value)
}
.n = count
.c = chars
"""
    out = remap_program(_coll(spark), src)["primary"].collect()[0]
    assert (out.n, out.c) == (4, 12)


def test_closure_for_each_map_string_accumulator(spark):
    src = """
joined = ""
for_each(.attrs) -> |key, value| { joined = joined + key + "=" + value + ";" }
.j = joined
"""
    out = remap_program(_coll(spark), src)["primary"].collect()[0]
    assert out.j == "a=x;b=y;"


def test_closure_nested_composition(spark):
    src = (
        ".alt = map_values(filter(array!(.tags)) -> |i, v| { i % 2 == 0 })"
        " -> |v| { upcase(v) }"
    )
    out = remap_program(_coll(spark), src)["primary"].collect()[0]
    assert out.alt == ["FOO", "FOO"]


def _nested(spark):
    return spark.createDataFrame(
        [
            (
                {"labels": {"app.kubernetes.io/name": "mysql"},
                 "meta.x": {"a.b": "c"}},
                [{"k.1": "v1"}, {"k.2": "v2"}],
                {"outer": {"a": "x", "b": "y"}},
            )
        ],
        "obj map<string,map<string,string>>, "
        "arr array<map<string,string>>, "
        "nested map<string,map<string,string>>",
    )


def test_closure_map_keys_recursive_dedot_cue_example(spark):
    # map_keys.cue recursive example: de-dot keys at EVERY nesting level
    out = remap_program(
        _nested(spark),
        '.dk = map_keys(.obj, recursive: true) -> |key| '
        '{ replace(key, ".", "_") }',
    )["primary"].collect()[0]
    got = {k: dict(v) for k, v in out.dk.items()}
    assert got == {
        "labels": {"app_kubernetes_io/name": "mysql"},
        "meta_x": {"a_b": "c"},
    }


def test_closure_map_keys_recursive_through_arrays(spark):
    # map_keys.cue rule 3: objects nested inside arrays are reached too
    out = remap_program(
        _nested(spark),
        ".ak = map_keys(.nested, recursive: true) -> |k| { upcase(k) }\n",
    )["primary"].collect()[0]
    assert {k: dict(v) for k, v in out.ak.items()} == {
        "OUTER": {"A": "x", "B": "y"}
    }
    df = spark.createDataFrame(
        [({"rows": [{"a.b": "1"}]},)],
        "doc map<string,array<map<string,string>>>",
    )
    out2 = remap_program(
        df,
        '.dk = map_keys(.doc, recursive: true) -> |k| '
        '{ replace(k, ".", "_") }',
    )["primary"].collect()[0]
    assert {k: [dict(m) for m in v] for k, v in out2.dk.items()} == {
        "rows": [{"a_b": "1"}]
    }


def test_closure_map_values_recursive_scalar_leaves(spark):
    # map_values.cue recursive: closure reaches leaves of nested
    # collections (our static-plan deviation: collections are recursed
    # into, scalar leaves get the closure)
    out = remap_program(
        _nested(spark),
        ".uv = map_values(.nested, recursive: true) -> |v| { upcase(v) }\n"
        ".av = map_values(.arr, recursive: true) -> |v| { upcase(v) }",
    )["primary"].collect()[0]
    assert {k: dict(v) for k, v in out.uv.items()} == {
        "outer": {"a": "X", "b": "Y"}
    }
    assert [dict(m) for m in out.av] == [{"k.1": "V1"}, {"k.2": "V2"}]


def test_closure_map_values_recursive_flat_is_plain(spark):
    # recursive over an already-flat map degrades to the plain form
    out = remap_program(
        _coll(spark),
        ".x = map_values(.attrs, recursive: true) -> |v| { upcase(v) }",
    )["primary"].collect()[0]
    assert dict(out.x) == {"a": "X", "b": "Y"}


def test_closure_multi_statement_body(spark):
    # VRL block semantics: locals before the final value expression
    src = """
.norm = map_values(array!(.tags)) -> |v| {
  u = upcase(v)
  pre = slice!(u, 0, 2)
  pre + "-" + u
}
"""
    out = remap_program(_coll(spark), src)["primary"].collect()[0]
    assert out.norm == ["FO-FOO", "BA-BAR", "FO-FOO", "BA-BAZ"]


def test_closure_multi_statement_nonassign_raises(spark):
    with pytest.raises(VrlCompileError, match="local-variable assignments"):
        remap_program(
            _coll(spark),
            '.x = map_values(array!(.tags)) -> |v| { upcase(v) upcase(v) }',
        )


def test_closure_recursive_on_filter_raises(spark):
    with pytest.raises(VrlCompileError, match="non-recursive"):
        remap_program(
            _coll(spark),
            ".x = filter(.attrs, recursive: true) -> |k, v| { true }",
        )


def test_closure_map_values_recursive_three_level_heterogeneous(spark):
    # array -> map -> array, mixed collection kinds at every level: the
    # recursion must pick transform vs transform_values per level from
    # the static dtype and apply the closure only at the scalar leaves
    df = spark.createDataFrame(
        [([{"a": [1, 2], "b": [3]}, {"c": [4]}],)],
        "deep array<map<string,array<bigint>>>",
    )
    out = remap_program(
        df,
        ".x = map_values(.deep, recursive: true) -> |v| { v * 10 + 1 }",
    )["primary"].collect()[0]
    assert [{k: list(v) for k, v in m.items()} for m in out.x] == [
        {"a": [11, 21], "b": [31]},
        {"c": [41]},
    ]


def test_closure_map_values_recursive_struct_leaf_raises_loudly(spark):
    # a map whose value type is a struct cannot take a scalar closure;
    # the compile error must be a loud VRL-level one, not a downstream
    # Spark analysis failure
    df = spark.createDataFrame(
        [({"p": {"x": 1}},)],
        "doc map<string,struct<x:bigint>>",
    )
    with pytest.raises(VrlCompileError, match="struct-typed value"):
        remap_program(
            df,
            ".x = map_values(.doc, recursive: true) -> |v| { v }",
        )
    df2 = spark.createDataFrame(
        [([{"x": 1}],)], "arr array<struct<x:bigint>>"
    )
    with pytest.raises(VrlCompileError, match="struct-typed element"):
        remap_program(
            df2,
            ".x = map_values(.arr, recursive: true) -> |v| { v }",
        )


def test_closure_map_keys_struct_hiding_maps_raises_loudly(spark):
    # a struct value whose fields contain maps would make recursive
    # map_keys a PARTIAL rename (struct field names are static); that
    # must be a loud compile error, not a silent skip
    df = spark.createDataFrame(
        [({"outer": {"inner": {"a.b": "1"}}},)],
        "doc map<string,struct<inner:map<string,string>>>",
    )
    with pytest.raises(VrlCompileError, match="struct-typed value"):
        remap_program(
            df,
            '.x = map_keys(.doc, recursive: true) -> |k| '
            '{ replace(k, ".", "_") }',
        )
    # a map-free struct value is a legitimate no-op (nothing renameable)
    df2 = spark.createDataFrame(
        [({"outer": {"x": 1}},)], "doc map<string,struct<x:bigint>>"
    )
    out = remap_program(
        df2, ".x = map_keys(.doc, recursive: true) -> |k| { upcase(k) }"
    )["primary"].collect()[0]
    assert set(out.x.keys()) == {"OUTER"} and out.x["OUTER"].x == 1


def test_closure_untyped_target_raises(spark):
    df = _one(spark, foo="x")
    with pytest.raises(VrlCompileError, match="statically-typed"):
        remap_program(df, ".x = filter(.foo) -> |i, v| { v }")


def test_closure_for_each_path_write_raises(spark):
    with pytest.raises(VrlCompileError, match="only assign variables"):
        remap_program(
            _coll(spark),
            'for_each(array!(.tags)) -> |_i, v| { .hit = v }',
        )


def test_closure_for_each_accumulator_needs_literal_init(spark):
    with pytest.raises(VrlCompileError, match="literal-initialized"):
        remap_program(
            _coll(spark),
            "acc = [] \n"
            "for_each(array!(.tags)) -> |_i, v| { acc = v }\n"
            ".n = acc",
        )


def test_closure_local_variables_stay_scoped(spark):
    # for_each.cue scoping: new variables in the closure block are
    # unavailable outside it
    src = """
total = 0
for_each(array!(.tags)) -> |_i, v| {
  local = length(v)
  total = total + local
}
.t = total
"""
    out = remap_program(_coll(spark), src)["primary"].collect()[0]
    assert out.t == 12


# --- dynamic paths: get / set / remove (get.cue / set.cue / remove.cue) ------
def test_get_set_remove_dynamic_map(spark):
    df = spark.createDataFrame(
        [({"a": "x", "b": "y"}, "a")], "attrs map<string,string>, key string"
    )
    src = """
.val = get!(.attrs, [.key])
.attrs2 = set(.attrs, ["added"], "yes")
.added = get(.attrs2, ["added"])
.rest = remove(.attrs, [.key])
.n_rest = length(.rest)
.miss = get(.attrs, ["zz"])
"""
    out = remap_program(df, src)["primary"].collect()[0]
    assert (out.val, out.added, out.n_rest, out.miss) == ("x", "yes", 1, None)
    assert dict(out.rest) == {"b": "y"}


def test_get_set_struct_and_object_literal(spark):
    df = spark.createDataFrame([(("v1", 5),)], "ctx struct<s string, n long>")
    src = """
.s = get(.ctx, ["s"])
.ctx2 = set(.ctx, ["n"], 9)
.obj = set({"p": 1, "q": 2}, ["q"], 3)
.drop = remove(.ctx, ["s"])
"""
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.s == "v1"
    assert out.ctx2.asDict() == {"s": "v1", "n": 9}
    assert out.obj.asDict() == {"p": 1, "q": 3}
    assert out.drop.asDict() == {"n": 5}


def test_get_negative_array_index(spark):
    # get.cue: negative literal indices read from the end (VRL -1 = last)
    df = spark.createDataFrame([(["a", "b", "c"],)], "arr array<string>")
    src = """
.first = get(.arr, [0])
.last = get(.arr, [-1])
.prev = get(.arr, [-2])
"""
    out = remap_program(df, src)["primary"].collect()[0]
    assert (out.first, out.last, out.prev) == ("a", "c", "b")


def test_closure_for_each_param_shadows_outer_var(spark):
    # a closure parameter shadowing an outer variable is closure-local
    # (VRL scoping): body reads see the ELEMENT, and the outer variable
    # is not misclassified as a mutated accumulator
    src = """
value = "outer"
total = 0
for_each(array!(.tags)) -> |_i, value| { total = total + length(value) }
.t = total
.v = value
"""
    out = remap_program(_coll(spark), src)["primary"].collect()[0]
    assert out.t == 12  # foo+bar+foo+baz, the elements, not "outer"
    assert out.v == "outer"


def test_set_multisegment_path_raises_on_map(spark):
    df = spark.createDataFrame([({"a": "x"},)], "attrs map<string,string>")
    with pytest.raises(VrlCompileError, match="1-segment"):
        remap_program(df, '.x = set(.attrs, ["a", "b"], 1)')


def test_get_path_must_be_array(spark):
    df = spark.createDataFrame([({"a": "x"},)], "attrs map<string,string>")
    with pytest.raises(VrlCompileError, match="path ARRAY"):
        remap_program(df, '.x = get(.attrs, "a")')
