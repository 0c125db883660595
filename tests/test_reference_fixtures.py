"""Real-world fixture parity: the reference's vendored tests/data files —
genuine AWS ALB access logs (plain, gzip, zstd) and a UTF-16LE text file —
through the engine's readers and parsers."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

_DATA = Path("/root/reference/tests/data")


def _need(p: Path):
    if not p.exists():
        pytest.skip("reference fixtures unavailable")


def test_alb_log_fixture_parses(spark):
    """multipart-zst.log: real ALB lines — parse_aws_alb_log field checks."""
    p = _DATA / "multipart-zst.log"
    _need(p)
    from vector_spark.functions.parse import parse_aws_alb_log

    df = spark.read.text(str(p)).select(
        parse_aws_alb_log(F.col("value")).alias("p")
    )
    rows = df.select("p.*").collect()
    assert len(rows) >= 3
    r = rows[0]
    assert r.type == "http"
    assert r.elb == "app/jesse-test-balancer/622bd5733e76cea4"
    assert r.client_host == "45.146.165.157:41496"
    assert r.target_host is None  # '-' → null
    assert r.request_processing_time == -1.0
    assert r.elb_status_code == "503"
    assert r.received_bytes == 297 and r.sent_bytes == 734
    assert r.request_method == "GET"
    assert r.request_url.startswith("http://54.161.48.252:80/")
    assert r.request_protocol == "HTTP/1.1"
    assert "Mozilla/5.0" in r.user_agent
    assert r.target_group_arn.startswith("arn:aws:elasticloadbalancing")
    assert r.trace_id.startswith("Root=1-")
    assert r.actions_executed == "forward"


def test_alb_log_gzip_fixture(spark):
    """multipart-gzip.log.gz: Spark's native gzip line reader feeds the
    same parser — identical rows to the plain fixture."""
    gz, plain = _DATA / "multipart-gzip.log.gz", _DATA / "multipart-zst.log"
    _need(gz)
    from vector_spark.functions.parse import parse_aws_alb_log

    a = (
        spark.read.text(str(gz))
        .select(parse_aws_alb_log(F.col("value")).alias("p"))
        .select("p.timestamp", "p.client_host", "p.elb_status_code")
        .collect()
    )
    b = (
        spark.read.text(str(plain))
        .select(parse_aws_alb_log(F.col("value")).alias("p"))
        .select("p.timestamp", "p.client_host", "p.elb_status_code")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_enrichment_table_csv_fixture(spark):
    """enrichment.csv through the reference's [enrichment_tables.X] config
    shape: typed CSV table referenced by name from an enrich transform."""
    p = _DATA / "enrichment.csv"
    _need(p)
    from vector_spark.plans import compile_config

    df = spark.createDataFrame([(1, "e1"), (3, "e3"), (9, "e9")], "id long, ev string")
    config = {
        "enrichment_tables": {
            "test": {
                "type": "file",
                "file": {"path": str(p), "encoding": {"type": "csv"}},
                "schema": {"id": "integer", "tree": "string"},
            }
        },
        "sources": {"in": {"type": "memory"}},
        "transforms": {
            "lookup": {"type": "enrich", "inputs": ["in"], "table": "test", "on": ["id"]}
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["lookup"]}},
    }
    topo = compile_config(spark, config, overrides={"in": df})
    got = {r.id: r.tree for r in topo.resolve("lookup").collect()}
    assert got == {1: "oak", 3: "yew", 9: None}


def test_reference_example_configs_validate(spark):
    """config/examples/*.yaml from the reference pass structural
    validation (types known, inputs resolve, acyclic) through
    compile_config — the `vector validate` parity surface."""
    from vector_spark.plans import compile_config
    from vector_spark.plans.topology import load_config

    base = Path("/root/reference/config/examples")
    _need(base)
    checked = 0
    for f in sorted(base.glob("*.yaml")):
        cfg = load_config(f)
        compile_config(spark, cfg)  # raises on structural problems
        checked += 1
    assert checked >= 5


def test_config_dir_loading():
    """tests/config-dir fixtures: multi-file merge, duplicate-global
    rejection, non-config files ignored."""
    from vector_spark.plans.topology import load_config_dir

    base = Path("/root/reference/tests/config-dir")
    _need(base / "globals")
    cfg = load_config_dir(base / "globals")
    assert cfg["data_dir"] == "/var/lib/vector"
    assert cfg["sources"]["source0"]["type"] == "demo_logs"
    assert cfg["sinks"]["sink0"]["inputs"] == ["source0"]

    with pytest.raises(ValueError, match="duplicate config key"):
        load_config_dir(base / "globals-duplicate")

    cfg2 = load_config_dir(base / "ignore-unknown")  # foo.txt skipped
    assert "sources" in cfg2 or "sinks" in cfg2 or cfg2


def test_namespaced_config_loading():
    """tests/namespacing fixtures: sources/NAME.toml become components;
    files in unknown subdirs are ignored."""
    from vector_spark.plans.topology import load_config_dir

    base = Path("/root/reference/tests/namespacing")
    _need(base / "success")
    cfg = load_config_dir(base / "success")
    assert cfg["sources"]["apache_logs"]["type"] == "file"
    assert cfg["transforms"]["apache_parser"]
    assert cfg["transforms"]["apache_sample"]["rate"] == 2
    assert cfg["sinks"]["es_cluster"]
    assert any(t.get("name") == "foo" for t in cfg["tests"])

    cfg2 = load_config_dir(base / "ignore-invalid")
    assert "this" not in cfg2  # foo/bar.toml ignored


def test_utf16le_charset_transcode(spark):
    """utf-16le.log through read_lines_charset — BOM stripped, readable
    UTF-8 lines (reference src/encoding_transcode.rs)."""
    p = _DATA / "utf-16le.log"
    _need(p)
    from vector_spark.sources.readers import read_lines_charset

    rows = read_lines_charset(spark, str(p), "utf-16le").collect()
    assert rows, "no lines decoded"
    text = rows[0].value
    assert text.startswith("hello i am a file")
    assert "﻿" not in text and "\x00" not in text


def test_env_var_interpolation():
    """Config env-var interpolation — the exact src/config/vars.rs grammar:
    $VAR, ${VAR}, ${VAR-d}, ${VAR:-d}, ${VAR?e}, ${VAR:?e}, $$ escape."""
    from vector_spark.plans.topology import interpolate_vars

    env = {"HOST": "web1", "EMPTY": ""}
    assert interpolate_vars("h=$HOST", env) == "h=web1"
    assert interpolate_vars("h=${HOST}", env) == "h=web1"
    assert interpolate_vars("x=${MISSING-dflt}", env) == "x=dflt"
    assert interpolate_vars("x=${EMPTY-dflt}", env) == "x="
    assert interpolate_vars("x=${EMPTY:-dflt}", env) == "x=dflt"
    assert interpolate_vars("cost=$$5", env) == "cost=$5"
    with pytest.raises(ValueError, match="missing env var"):
        interpolate_vars("x=$NOPE", env)
    with pytest.raises(ValueError, match="required"):
        interpolate_vars("x=${NOPE:?must be set}", env)
    assert interpolate_vars("x=${NOPE?e}", {"NOPE": ""}) == "x="


def test_vrl_enrichment_lookup_in_topology(spark):
    """A VRL `source` program using get_enrichment_table_record! against a
    config-declared [enrichment_tables.X] — the full reference shape."""
    p = _DATA / "enrichment.csv"
    _need(p)
    from vector_spark.plans import compile_config

    df = spark.createDataFrame([(1,), (3,)], "id long")
    config = {
        "enrichment_tables": {
            "test": {
                "type": "file",
                "file": {"path": str(p), "encoding": {"type": "csv"}},
                "schema": {"id": "integer"},
            }
        },
        "sources": {"in": {"type": "memory"}},
        "transforms": {
            "look": {
                "type": "remap",
                "inputs": ["in"],
                "source": '.row = get_enrichment_table_record!("test", { "id": .id })',
            }
        },
        "sinks": {"out": {"type": "blackhole", "inputs": ["look"]}},
    }
    topo = compile_config(spark, config, overrides={"in": df})
    got = {r.id: r.row.tree for r in topo.resolve("look").collect()}
    assert got == {1: "oak", 3: "yew"}
