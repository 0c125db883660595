"""CLI subcommand parity (reference src/cli.rs:270-321): list, generate,
convert-config, config, and the VRL one-shot runner. The expression
grammar and emitters are pure functions — tested without a subprocess;
the vrl path reuses the session fixture via the same code the CLI calls.
"""

from __future__ import annotations

import json
import tomllib

import pytest
from pyspark.sql import functions as F

from vector_spark.__main__ import (
    _emit_config,
    _parse_generate_expr,
    _toml_dump,
)


def test_generate_expression_grammar():
    cfg = _parse_generate_expr("demo_logs/remap,filter/console")
    assert list(cfg["sources"]) == ["source1"]
    assert cfg["transforms"]["transform1"]["inputs"] == ["source1"]
    assert cfg["transforms"]["transform2"]["inputs"] == ["transform1"]
    assert cfg["sinks"]["sink1"]["inputs"] == ["transform2"]
    # named components (generate.rs: `<name>:type` prefixes)
    cfg = _parse_generate_expr("foo:stdin/bar:remap/baz:http")
    assert set(cfg["sources"]) == {"foo"}
    assert cfg["sinks"]["baz"]["inputs"] == ["bar"]


def test_generate_partial_expressions():
    # reference doc: '/filter' prints just a filter transform; '//file'
    # just a sink; 'stdin//http' skips transforms (sink eats the source)
    assert set(_parse_generate_expr("/filter")) == {"transforms"}
    assert set(_parse_generate_expr("//console")) == {"sinks"}
    cfg = _parse_generate_expr("stdin//socket")
    assert cfg["sinks"]["sink1"]["inputs"] == ["source1"]


def test_generate_unknown_types_error():
    with pytest.raises(ValueError, match="unknown source type"):
        _parse_generate_expr("nope/remap/console")
    with pytest.raises(ValueError, match="unknown transform type"):
        _parse_generate_expr("stdin/nope/console")
    with pytest.raises(ValueError, match="unknown sink type"):
        _parse_generate_expr("stdin/remap/nope")


def test_toml_emitter_roundtrips():
    cfg = _parse_generate_expr("demo_logs/remap,filter,throttle/console")
    text = _toml_dump(cfg)
    assert tomllib.loads(text) == cfg
    # multi-line strings and escapes survive
    tricky = {"transforms": {"t": {"type": "remap",
                                   "source": 'a = "x"\nb = 1'}}}
    assert tomllib.loads(_toml_dump(tricky)) == tricky


def test_emit_config_formats_agree():
    import yaml

    cfg = _parse_generate_expr("demo_logs/remap/console")
    assert json.loads(_emit_config(cfg, "json")) == cfg
    assert yaml.safe_load(_emit_config(cfg, "yaml")) == cfg
    assert tomllib.loads(_emit_config(cfg, "toml")) == cfg


def test_generated_config_compiles(spark):
    from vector_spark.plans import compile_config

    cfg = _parse_generate_expr("demo_logs/remap,filter/console")
    topo = compile_config(spark, cfg)
    outs = topo.outputs()
    assert set(outs) == {"sink1"}
    assert outs["sink1"].count() > 0
    assert "generated" in outs["sink1"].columns


def test_list_registries_nonempty():
    from vector_spark.plans.sink_registry import BUILTIN_SINKS, SINK_TYPES
    from vector_spark.plans.source_registry import SOURCE_TYPES
    from vector_spark.plans.topology import TRANSFORM_TYPES

    assert len(SOURCE_TYPES) >= 40
    assert len(TRANSFORM_TYPES) >= 15
    assert len(set(SINK_TYPES) | set(BUILTIN_SINKS)) >= 50


def test_vrl_one_shot_semantics(spark):
    """The vrl subcommand's engine path: JSON-lines → inferred frame →
    remap_program → JSON-lines out (vrl::cli parity for one-shot runs)."""
    from vector_spark.vrl import remap_program

    lines = [
        '{"message":"hello world","n":3}',
        '{"message":"bye","n":9}',
    ]
    df = spark.read.json(spark.sparkContext.parallelize(lines, 2))
    outs = remap_program(
        df, '.shout = upcase(string!(.message)); .n2 = .n * 2'
    )
    rows = {
        json.loads(r[0])["message"]: json.loads(r[0])
        for r in outs["primary"]
        .select(F.to_json(F.struct("message", "n", "shout", "n2")))
        .collect()
    }
    assert rows["hello world"]["shout"] == "HELLO WORLD"
    assert rows["bye"]["n2"] == 18


# --- property: the TOML emitter round-trips arbitrary config-shaped dicts ---

from hypothesis import example, given, settings
from hypothesis import strategies as st

_key = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_-", min_size=1, max_size=12
)
_scalar = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=40),
    st.lists(st.text(max_size=10), max_size=4),
)
_config = st.recursive(
    st.dictionaries(_key, _scalar, max_size=4),
    lambda inner: st.dictionaries(_key, st.one_of(_scalar, inner), max_size=4),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(_config)
@example(
    cfg={'_': '\n\x7f'},
).via('discovered failure')
def test_toml_emitter_roundtrip_property(cfg):
    assert tomllib.loads(_toml_dump(cfg)) == cfg


def test_generate_schema_shape():
    """generate-schema emits a JSON Schema whose type enums are the live
    registries — a generated config always validates structurally."""
    from vector_spark.__main__ import _cmd_generate_schema
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert _cmd_generate_schema() == 0
    schema = json.loads(buf.getvalue())
    comp = schema["properties"]["transforms"]["additionalProperties"]
    assert "remap" in comp["properties"]["type"]["enum"]
    assert comp["required"] == ["type", "inputs"]
    src = schema["properties"]["sources"]["additionalProperties"]
    assert "inputs" not in src["properties"]
    cfg = _parse_generate_expr("demo_logs/remap/console")
    for sec in ("sources", "transforms", "sinks"):
        enum = set(
            schema["properties"][sec]["additionalProperties"]["properties"][
                "type"
            ]["enum"]
        )
        assert all(c["type"] in enum for c in cfg[sec].values())
