"""encoded_file topology sink (plans/topology.py::_encoded_line)."""

from __future__ import annotations

import json

from vector_spark.plans.topology import compile_config


def _run(spark, tmp_path, encoding, fields=None):
    sink = {
        "type": "encoded_file",
        "inputs": ["src"],
        "encoding": encoding,
        "path": str(tmp_path / encoding),
    }
    if fields:
        sink["fields"] = fields
    config = {
        "sources": {
            "src": {
                "type": "inline",
                "rows": [(1, "alpha", 'say "hi"'), (2, "beta", "plain")],
                "schema": "id long, name string, msg string",
            }
        },
        "sinks": {"enc": sink},
    }
    compile_config(spark, config).write_sinks()
    return sorted(
        r.value for r in spark.read.text(str(tmp_path / encoding)).collect()
    )


def test_encoded_file_json(spark, tmp_path):
    lines = _run(spark, tmp_path, "json")
    assert lines == [
        '{"id":1,"msg":"say \\"hi\\"","name":"alpha"}',
        '{"id":2,"msg":"plain","name":"beta"}',
    ]


def test_encoded_file_native_json_and_fields(spark, tmp_path):
    lines = _run(spark, tmp_path, "native_json", fields=["id", "name"])
    assert lines == [
        '{"log":{"id":1,"name":"alpha"}}',
        '{"log":{"id":2,"name":"beta"}}',
    ]
    parsed = [json.loads(ln) for ln in lines]
    assert all("log" in p for p in parsed)


def test_encoded_file_logfmt(spark, tmp_path):
    lines = _run(spark, tmp_path, "logfmt", fields=["id", "name"])
    assert lines == ["id=1 name=alpha", "id=2 name=beta"]
