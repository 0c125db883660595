"""The reference's lua behavior corpus (tests/behavior/transforms/
lua_v1.toml, lua_v2.toml), reproduced through the engine's packaged
escape hatch: `operators/script.py` (Arrow-batched init/process/shutdown —
the documented non-port of the lua VM, COVERAGE.md §2.1).

Each corpus lua hook is hand-mapped to its batched-pandas equivalent (the
user-code contract of script_transform); the INPUTS and OUTPUT CONDITIONS
come from the toml fixtures verbatim and are evaluated with the VRL
condition compiler — so the event semantics (field move, insert,
metric increment, log↔metric conversion) are still checked against the
reference's own assertions.
"""

from __future__ import annotations

import tomllib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vector_spark.conditions import to_column
from vector_spark.operators.script import script_transform

_REF = Path("/root/reference/tests/behavior/transforms")


def _case(fname: str, name: str):
    p = _REF / fname
    if not p.exists():
        pytest.skip("reference corpus unavailable")
    doc = tomllib.loads(p.read_text())
    for t in doc["tests"]:
        if t["name"] == name:
            return t
    raise AssertionError(name)


def _check(df, test) -> None:
    for out_spec in test["outputs"]:
        for cond in out_spec.get("conditions", []):
            col = to_column(cond, df)
            assert df.filter(F.coalesce(col, F.lit(False))).count() > 0, (
                cond
            )


@pytest.mark.parametrize("fname,name", [
    ("lua_v1.toml", "lua_unversioned"),
    ("lua_v1.toml", "lua_v1"),
    ("lua_v2.toml", "lua_v2_log"),
])
def test_lua_field_move(spark, fname, name):
    # lua: event["a"], event["b"] = nil, event["a"]
    test = _case(fname, name)
    fields = test["input"]["log_fields"]
    df = spark.createDataFrame([(fields["a"],)], "a string")

    def process(pdf, state):
        pdf = pdf.assign(b=pdf["a"]).drop(columns=["a"])
        return pdf

    out = script_transform(df, process, schema="b string")
    _check(out, test)


def test_lua_insert_field(spark):
    # lua: event.log.inserted_field = "inserted value"
    test = _case("lua_v2.toml", "lua_v2_source")
    fields = test["input"]["log_fields"]
    df = spark.createDataFrame([(fields["some_field"],)], "some_field string")

    def process(pdf, state):
        return pdf.assign(inserted_field="inserted value")

    out = script_transform(
        df, process, schema="some_field string, inserted_field string"
    )
    _check(out, test)


def test_lua_metric_increment(spark):
    # lua: event.metric.counter.value = event.metric.counter.value + 1
    test = _case("lua_v2.toml", "lua_v2_metric")
    m = test["input"]["metric"]
    df = spark.createDataFrame(
        [(m["name"], m["kind"], float(m["counter"]["value"]))],
        "name string, kind string, counter double",
    )

    def process(pdf, state):
        pdf["counter"] = pdf["counter"] + 1.0
        return pdf

    out = script_transform(df, process)
    _check(out, test)  # is_metric: metric-shaped frame
    assert out.collect()[0].counter == 2.0


def test_lua_log_to_metric(spark):
    # lua: event.log = nil; event.metric = {name=..., counter={value=1.0}}
    test = _case("lua_v2.toml", "lua_v2_log_to_metric")
    df = spark.createDataFrame([("example value",)], "a string")

    def process(pdf, state):
        import pandas as pd

        return pd.DataFrame(
            {
                "name": ["example metric"] * len(pdf),
                "kind": ["absolute"] * len(pdf),
                "counter": [1.0] * len(pdf),
            }
        )

    out = script_transform(
        df, process, schema="name string, kind string, counter double"
    )
    _check(out, test)  # is_metric


def test_lua_metric_to_log(spark):
    # lua: event.metric = nil; event.log = {field = "example value"}
    test = _case("lua_v2.toml", "lua_v2_metric_to_log")
    m = test["input"]["metric"]
    df = spark.createDataFrame(
        [(m["name"], m["kind"], float(m["counter"]["value"]))],
        "name string, kind string, counter double",
    )

    def process(pdf, state):
        import pandas as pd

        return pd.DataFrame({"field": ["example value"] * len(pdf)})

    out = script_transform(df, process, schema="field string")
    _check(out, test)
