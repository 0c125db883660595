"""Run the reference's NON-remap behavior corpus verbatim — dedupe.toml,
filter.toml, route.toml, reduce.toml from tests/behavior/transforms/ — the
fixtures `vector test` executes against the Rust engine, re-expressed
through compile_config + the engine's own transforms.

Semantics match the reference unit-test harness
(src/config/unit_test/unit_test_components.rs:214-227): a condition passes
when ANY output event satisfies it; `no_outputs_from` demands zero events.
`SUPPORTED` pins the passing set; skips name the unsupported construct.
"""

from __future__ import annotations

import copy
import datetime
import tomllib
from pathlib import Path

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vector_spark.conditions import to_column
from vector_spark.plans import compile_config

_REF = Path("/root/reference/tests/behavior/transforms")
_FILES = [
    "dedupe.toml",
    "filter.toml",
    "route.toml",
    "reduce.toml",
    "task_transform.toml",
]

SUPPORTED: set[str] = {
    "dedupe:dedupe_field_order",
    "dedupe:dedupe_nested_fields",
    "dedupe:dedupe_simple",
    "filter:filter test 1a",
    "filter:filter test 1b",
    "filter:filter test 1c",
    "filter:filter test 2a",
    "filter:filter test 2b",
    "filter:filter test 2c",
    "filter:filter test 3a",
    "reduce:reduce_basic",
    "reduce:reduce_ends_when_vrl",
    "reduce:reduce_java_exception",
    "reduce:reduce_line_continuation",
    "reduce:reduce_line_termination",
    "reduce:reduce_log_stream",
    "reduce:reduce_merge_strategies",
    "reduce:reduce_number_strategies_1",
    "reduce:reduce_number_strategies_2",
    "reduce:reduce_ruby_exception",
    "route:route test 1",
    "route:route test 2",
    "task_transform:dedupe_into_reduce_with_multiple_inputs",
    "task_transform:reduce_with_multiple_inputs",
}


def _load_cases():
    cases = []
    for fname in _FILES:
        p = _REF / fname
        if not p.exists():
            return []
        doc = tomllib.loads(p.read_text())
        for t in doc.get("tests", []):
            cases.append((f"{fname[:-5]}:{t['name']}", doc["transforms"], t))
    return cases


_CASES = _load_cases()
_EPOCH = datetime.datetime(2020, 1, 1)


def _shape(v) -> object:
    """Structural signature for cross-row schema unification: rows whose
    signatures differ for the same key can't share one typed column and
    become a VariantType column instead (dedupe_nested_fields: `a.b.c`
    nested under one event, `a.b` a plain string in another)."""
    if isinstance(v, dict):
        return tuple(sorted((k, _shape(x)) for k, x in v.items()))
    if isinstance(v, list):
        return ("list",)
    # scalar kind mixes stay one column: Spark's inference coerces
    # conflicting scalars to string, matching the pre-variant behavior
    return "scalar"


def _set_path(fields: dict, key: str, v) -> None:
    """Dotted log_fields keys are event PATHS (reference path syntax)."""
    parts = key.split(".")
    d = fields
    for p in parts[:-1]:
        nxt = d.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            d[p] = nxt
        d = nxt
    d[parts[-1]] = v


def _rows_of(indexed: list[tuple[int, dict]]) -> tuple[list[dict], set[str]]:
    """Rows for one insert point; ``indexed`` carries the GLOBAL arrival
    index so ordering is preserved across insert points. Returns the rows
    plus the top-level keys that must load as VariantType (JSON-encoded in
    the row dicts) because their shape differs across rows."""
    keys: list[str] = []
    raws = []
    for i, inp in indexed:
        if inp.get("type") == "metric":
            m = inp["metric"]
            fields = {k: v for k, v in m.items()}
        elif "value" in inp:
            fields = {"message": inp["value"]}
        else:
            fields = {}
            for k, v in inp.get("log_fields", {}).items():
                # `name[0]`-style keys build arrays (reference path syntax)
                m_idx = k.rfind("[")
                if m_idx > 0 and k.endswith("]"):
                    base, idx = k[:m_idx], int(k[m_idx + 1 : -1])
                    arr = fields.setdefault(base, [])
                    arr.extend([None] * (idx + 1 - len(arr)))
                    arr[idx] = v
                elif "." in k:
                    _set_path(fields, k, v)
                else:
                    fields[k] = v
        # the reference stamps every unit-test event with a timestamp;
        # arrival order becomes an explicit column on a batch engine
        fields["timestamp"] = _EPOCH + datetime.timedelta(seconds=i)
        fields["__order"] = i
        for k in fields:
            if k not in keys:
                keys.append(k)
        raws.append(fields)
    rows = [{k: r.get(k) for k in keys} for r in raws]
    # unify int/float per field (Spark inference can't merge long+double)
    for k in keys:
        vals = [r[k] for r in rows if r[k] is not None]
        if any(isinstance(v, float) for v in vals) and any(
            isinstance(v, int) and not isinstance(v, bool) for v in vals
        ):
            for r in rows:
                if isinstance(r[k], int) and not isinstance(r[k], bool):
                    r[k] = float(r[k])
    # keys whose shape conflicts across rows load as variant (JSON text
    # here, try_parse_json after createDataFrame)
    import json

    variant_keys: set[str] = set()
    for k in keys:
        shapes = {_shape(r[k]) for r in rows if r[k] is not None}
        if len(shapes) > 1:
            variant_keys.add(k)
            for r in rows:
                r[k] = json.dumps(r[k]) if r[k] is not None else None
    return rows, variant_keys


def _reachable(transforms: dict, roots: set[str]) -> dict:
    """Keep only transforms whose input chain leads back to a root."""
    out: dict = {}
    changed = True
    while changed:
        changed = False
        for name, cfg in transforms.items():
            if name in out:
                continue
            for ref in cfg.get("inputs", []):
                base = ref.split(".", 1)[0]
                if base in roots or base in out:
                    out[name] = cfg
                    changed = True
                    break
    return out


def _run_case(spark, transforms: dict, test: dict) -> tuple[bool, str]:
    inputs = test.get("inputs") or [test["input"]]
    from tests.test_remap_corpus import _to_row

    # group inputs per insert point, preserving global arrival order
    groups: dict[str, list[tuple[int, dict]]] = {}
    for i, inp in enumerate(inputs):
        groups.setdefault(inp["insert_at"], []).append((i, inp))
    overrides = {}
    for t, g in groups.items():
        rows, variant_keys = _rows_of(g)
        df = spark.createDataFrame([_to_row(r) for r in rows])
        for vk in variant_keys:
            df = df.withColumn(vk, F.try_parse_json(F.col(vk)))
        overrides[f"__in_{t}"] = df

    transforms = copy.deepcopy(transforms)
    # transforms reachable from any insert point stay; each insert target
    # gets its injected source prepended, other inputs keep only reachable
    # feeds (the reference injects events INTO the transform)
    pruned = _reachable(transforms, set(groups))
    live = set(pruned) | set(groups)
    for name in set(groups) | set(pruned):
        cfg = transforms[name]
        kept = [
            ref
            for ref in cfg.get("inputs", [])
            if ref.split(".", 1)[0] in live
        ]
        if name in groups:
            kept = [f"__in_{name}"] + kept
        cfg["inputs"] = kept
        if cfg.get("type") == "reduce":
            cfg.setdefault("order_by", "__order")
            cfg["auto_merge"] = True
        if cfg.get("type") == "dedupe":
            cfg.setdefault("order_by", ["__order"])
        pruned[name] = cfg
    sink_target = next(iter(groups))
    config = {
        "sources": {k: {"type": "memory"} for k in overrides},
        "transforms": pruned,
        "sinks": {"__out": {"type": "blackhole", "inputs": [sink_target]}},
    }
    topo = compile_config(spark, config, overrides=overrides)

    for out_spec in test.get("outputs", []):
        ref = out_spec["extract_from"]
        target = topo.resolve(ref)
        if target.count() == 0:
            return False, f"no rows at {ref!r}"
        for cond in out_spec.get("conditions", []):
            col = to_column(cond, target)
            if target.filter(F.coalesce(col, F.lit(False))).count() == 0:
                return False, f"condition failed: {cond['source'][:90]!r}"
    for ref in test.get("no_outputs_from", []):
        if topo.resolve(ref).count() != 0:
            return False, f"expected no rows at {ref!r}"
    return True, ""


@pytest.mark.parametrize(
    "name,transforms,test", _CASES, ids=[c[0] for c in _CASES]
)
def test_behavior_corpus(spark, name, transforms, test):
    if name not in SUPPORTED:
        pytest.skip("corpus case not yet in the supported set")
    ok, why = _run_case(spark, transforms, test)
    assert ok, why


@pytest.mark.parametrize(
    "fname", ["simple.toml", "simple.yaml", "simple.yml", "simple.json"]
)
def test_formats_corpus(spark, fname):
    """tests/behavior/formats/*: the same fixture in every config format
    the reference loader accepts, through load_config + the VRL compiler."""
    from vector_spark.plans.topology import load_config

    p = Path("/root/reference/tests/behavior/formats") / fname
    if not p.exists():
        pytest.skip("reference corpus unavailable")
    doc = load_config(p)
    test = doc["tests"][0]
    tcfg = doc["transforms"][test["input"]["insert_at"]]
    from vector_spark.vrl import compile_expression, remap_program

    df = spark.createDataFrame([("",)], "message string")
    out = remap_program(df, tcfg["source"])["primary"]
    cond = test["outputs"][0]["conditions"][0]["source"]
    col = compile_expression(cond, dict(out.dtypes))
    assert out.filter(F.coalesce(col, F.lit(False))).count() == 1


def test_behavior_corpus_floor():
    if not _CASES:
        pytest.skip("reference corpus unavailable")
    names = {c[0] for c in _CASES}
    assert len(SUPPORTED & names) >= 24
