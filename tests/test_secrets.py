"""Config secret-backend interpolation — the reference's secret corpus
(tests/behavior/config/secret.toml) run end-to-end, plus the interpolation
grammar cases from src/config/loading/secret.rs's own unit tests.

The corpus's exec backend invokes a Rust example binary
(src/config/loading/secret_backend_example.rs) that isn't built here; the
test substitutes a Python one-liner speaking the SAME stdin/stdout JSON
protocol (version 1.0 query -> ``key: {value,error}`` map) and returning
the same ``<key>.retrieved`` values.
"""

from __future__ import annotations

import json
import sys
import tomllib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vector_spark.plans import secrets as S
from vector_spark.vrl import compile_expression, remap_program

REF = Path("/root/reference")
CORPUS = REF / "tests/behavior/config/secret.toml"

# protocol-equivalent stand-in for ./target/debug/secret-backend-example
EXEC_SUB = [
    sys.executable,
    "-c",
    (
        "import json,sys; q=json.load(sys.stdin); "
        "assert q['version']=='1.0'; "
        "print(json.dumps({k:{'value':k+'.retrieved','error':None} "
        "for k in q['secrets']}))"
    ),
]


# --- grammar (secret.rs:25-31 + its unit tests) ---


def test_collector_grammar():
    text = (
        'a="SECRET[backend.secret_name]" b="SECRET[backend.secret.name]" '
        'c="SECRET[backend..secret.name]" d="SECRET[secret_name]" '
        'e="SECRET[.secret.name]"'
    )
    got = S.collect_secret_keys(text)
    assert got == {"backend": {"secret_name", "secret.name", ".secret.name"}}


def test_interpolate_replacement_and_miss():
    secrets = {"a.secret.key": "value", "a...key": "a...value"}
    assert S.interpolate_secrets("SECRET[a.secret.key]", secrets) == "value"
    assert (
        S.interpolate_secrets("SECRET[a.secret.key] SECRET[a.secret.key]", secrets)
        == "value value"
    )
    assert (
        S.interpolate_secrets("xxxSECRET[a.secret.key]yyy", secrets) == "xxxvalueyyy"
    )
    assert S.interpolate_secrets("SECRET[a...key]", secrets) == "a...value"
    with pytest.raises(ValueError, match="Unable to find secret replacement"):
        S.interpolate_secrets("SECRET[b.key]", secrets)


# --- backends against the reference's own fixtures ---


def test_file_backend_fixture():
    cfg = {"type": "file", "path": "tests/data/secret-backends/file-secrets.json"}
    assert S._retrieve_one(cfg, {"ghi"}, REF) == {"ghi": "ghi.retrieved"}
    with pytest.raises(ValueError, match="not retrieved"):
        S._retrieve_one(cfg, {"missing"}, REF)


def test_directory_backend_fixture():
    cfg = {
        "type": "directory",
        "path": "tests/data/secret-backends/directory-secrets",
        "remove_trailing_whitespace": True,
    }
    assert S._retrieve_one(cfg, {"jkl"}, REF) == {"jkl": "jkl.retrieved"}
    # without trim the trailing newline stays (directory.rs:40-44)
    cfg2 = dict(cfg, remove_trailing_whitespace=False)
    assert S._retrieve_one(cfg2, {"jkl"}, REF)["jkl"] == "jkl.retrieved\n"


def test_exec_backend_protocol():
    cfg = {"type": "exec", "command": EXEC_SUB}
    assert S._retrieve_one(cfg, {"def"}, REF) == {"def": "def.retrieved"}


def test_unknown_backend_errors():
    with pytest.raises(ValueError, match='Backend "nope" is required'):
        S.retrieve({}, {"nope": {"k"}})


# --- the corpus, end-to-end ---


def _corpus_text_with_exec_sub() -> str:
    text = CORPUS.read_text()
    doc = tomllib.loads(text)
    assert doc["secret"]["exec_backend"]["command"] == [
        "./target/debug/secret-backend-example"
    ]
    return text.replace(
        'command = ["./target/debug/secret-backend-example"]',
        "command = " + json.dumps(EXEC_SUB),
    )


def test_secret_corpus_resolution():
    text = _corpus_text_with_exec_sub()
    resolved = S.resolve_config_secrets(text, tomllib.loads, base=REF)
    doc = tomllib.loads(resolved)
    src = doc["transforms"]["add_field_from_secret"]["source"]
    assert '.foobar = "this_is_a_secret_value"' in src
    assert '.foobarbaz = "def.retrieved"' in src
    assert '.foobarbazqux = "ghi.retrieved"' in src
    assert '.foobarbazquxquux = "jkl.retrieved"' in src


def test_secret_corpus_behavior(spark):
    """Run the corpus's remap test through the engine after resolution —
    the same check `vector test` performs on the Rust side."""
    text = _corpus_text_with_exec_sub()
    doc = tomllib.loads(S.resolve_config_secrets(text, tomllib.loads, base=REF))
    tcfg = doc["transforms"]["add_field_from_secret"]
    test = doc["tests"][0]
    df = spark.createDataFrame([(test["input"]["value"],)], "message string")
    out = remap_program(df, tcfg["source"])["primary"]
    for cond in test["outputs"][0]["conditions"]:
        col = compile_expression(cond["source"], dict(out.dtypes))
        assert out.filter(F.coalesce(col, F.lit(False))).count() == 1, cond["source"]


def test_load_config_resolves_secrets(tmp_path):
    from vector_spark.plans.topology import load_config

    p = tmp_path / "c.toml"
    p.write_text(
        "[secret.sb]\n"
        '  type = "test"\n'
        '  replacement = "swapped"\n'
        "[sinks.out]\n"
        '  type = "console"\n'
        '  inputs = ["in"]\n'
        '  token = "SECRET[sb.api_key]"\n'
    )
    cfg = load_config(p)
    assert cfg["sinks"]["out"]["token"] == "swapped"
    # no placeholders -> no backend touched, config unchanged
    p2 = tmp_path / "plain.toml"
    p2.write_text('[sinks.out]\n  type = "console"\n  inputs = ["in"]\n')
    assert load_config(p2)["sinks"]["out"]["type"] == "console"
