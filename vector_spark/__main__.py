"""CLI (≙ reference subcommands, src/cli.rs:270-321):

    python -m vector_spark validate <config>     # compile + typecheck only
    python -m vector_spark graph <config>        # DOT graph of the DAG
    python -m vector_spark run <config>          # execute all sinks
    python -m vector_spark test <config> <spec>  # unit-test harness
    python -m vector_spark top <config>          # run + per-component counters
    python -m vector_spark tap <config> <glob>   # sample events at outputs
    python -m vector_spark list [--format json]  # available component types
    python -m vector_spark config <path>         # resolved config as one JSON
    python -m vector_spark convert-config <in> <out.{toml,yaml,json}>
    python -m vector_spark generate <expr> [--format toml|yaml|json]
    python -m vector_spark vrl <program> [--input events.jsonl]

<config> is TOML/YAML/JSON (or a config DIRECTORY for `config`). The test
<spec> is JSON:
{"inserts": {comp: {"rows": [...], "schema": "..."}},
 "extracts": {comp_or_port: ["<condition>", ...]}}

`generate` takes the reference's expression grammar (src/generate.rs:97-115):
three comma-separated lists of source/transform/sink types divided by
slashes, each item optionally `name:type` — e.g. `demo_logs/remap,filter/
console` or `foo:stdin/bar:remap/baz:http`. The first transform consumes
all sources, each later one the previous; sinks consume the last transform.

`vrl` is the one-shot analog of the reference's VRL CLI (vrl::cli wired at
src/cli.rs:320,345-347): compile <program> (a file path or a literal) and
apply it to one JSON event per line from --input (default stdin), printing
the resulting events as JSON lines.
"""

from __future__ import annotations

import json
import sys


def _dot(config: dict) -> str:
    lines = ["digraph topology {", "  rankdir=LR;"]
    for name in config.get("sources", {}):
        lines.append(f'  "{name}" [shape=cylinder];')
    for name, cfg in config.get("transforms", {}).items():
        lines.append(f'  "{name}" [shape=box,label="{name}\\n({cfg["type"]})"];')
    for name in config.get("sinks", {}):
        lines.append(f'  "{name}" [shape=doublecircle];')
    for name, cfg in {**config.get("transforms", {}), **config.get("sinks", {})}.items():
        for ref in cfg.get("inputs", []):
            base, _, port = ref.partition(".")
            label = f' [label="{port}"]' if port else ""
            lines.append(f'  "{base}" -> "{name}"{label};')
    lines.append("}")
    return "\n".join(lines)


# --- config emitters ---------------------------------------------------------


def _toml_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        # readable multi-line form for programs (VRL sources), single-line
        # basic string otherwise. ensure_ascii=False keeps astral chars
        # literal — JSON's surrogate-pair \uXXXX escapes are invalid TOML.
        if "\n" in v and not any(
            # TOML forbids control chars in multiline basic strings too —
            # including DEL (0x7f), which is NOT < 0x20
            (ord(c) < 0x20 and c not in "\n\t") or ord(c) == 0x7F
            for c in v
        ) and "\\" not in v and '"""' not in v and not v.endswith('"'):
            return '"""\n' + v + '"""'
        # DEL is the one control char JSON leaves raw but TOML forbids
        return json.dumps(v, ensure_ascii=False).replace("\x7f", "\\u007f")
    if isinstance(v, list):
        return "[" + ", ".join(_toml_scalar(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{_toml_key(k)} = {_toml_scalar(x)}" for k, x in v.items()) + "}"
    raise ValueError(f"cannot TOML-encode {type(v).__name__}")


def _toml_key(k: str) -> str:
    return k if k.replace("_", "").replace("-", "").isalnum() and k else json.dumps(k)


def _toml_dump(d: dict, prefix: str = "") -> str:
    """Minimal TOML emitter for config-shaped dicts (scalars, arrays,
    nested tables). Round-trips through tomllib for every config this CLI
    emits (pinned in tests/test_cli_commands.py)."""
    scalars = {k: v for k, v in d.items() if not isinstance(v, dict)}
    tables = {k: v for k, v in d.items() if isinstance(v, dict)}
    out = []
    for k, v in scalars.items():
        out.append(f"{_toml_key(k)} = {_toml_scalar(v)}")
    for k, v in tables.items():
        path = f"{prefix}.{_toml_key(k)}" if prefix else _toml_key(k)
        body = _toml_dump(v, path)
        out.append(f"\n[{path}]" + (f"\n{body}" if body else ""))
    return "\n".join(out).lstrip("\n")


def _emit_config(config: dict, fmt: str) -> str:
    if fmt == "json":
        return json.dumps(config, indent=2, sort_keys=True)
    if fmt in ("yaml", "yml"):
        import yaml

        return yaml.safe_dump(config, sort_keys=True)
    if fmt == "toml":
        return _toml_dump(config)
    raise ValueError(f"unsupported output format {fmt!r}")


# --- generate ----------------------------------------------------------------

# minimal per-type skeleton fields so the generated config validates
# (reference generate.rs emits each component's serde defaults; here only
# the fields our compiler requires have no default)
_GEN_TRANSFORM_DEFAULTS = {
    "remap": {"source": '.generated = "true"'},
    "filter": {"condition": "true"},
    "route": {"route": {"a": "true"}},
    "exclusive_route": {
        "routes": [{"name": "a", "condition": "true"}]
    },
    "sample": {"rate": 10},
    "throttle": {"threshold": 100, "window_secs": 60},
    "dedupe": {"fields": {"match": ["message"]}},
    "reduce": {"group_by": []},
    "aggregate": {"interval_ms": 10000},
    "log_to_metric": {
        "metrics": [{"type": "counter", "field": "message", "name": "count"}]
    },
    "tag_cardinality_limit": {"value_limit": 500, "fields": ["message"]},
    "enrich": {"table": "t", "on": ["key"]},
}


def _parse_generate_expr(expr: str) -> dict:
    from vector_spark.plans.sink_registry import BUILTIN_SINKS, SINK_TYPES
    from vector_spark.plans.source_registry import SOURCE_TYPES
    from vector_spark.plans.topology import TRANSFORM_TYPES

    parts = (expr.split("/") + ["", "", ""])[:3]
    config: dict = {"sources": {}, "transforms": {}, "sinks": {}}
    counters = {"source": 0, "transform": 0, "sink": 0}

    def items(spec: str) -> list[tuple[str | None, str]]:
        out = []
        for item in filter(None, (s.strip() for s in spec.split(","))):
            name, sep, typ = item.partition(":")
            out.append((name, typ) if sep else (None, item))
        return out

    for name, typ in items(parts[0]):
        if typ not in SOURCE_TYPES:
            raise ValueError(f"unknown source type {typ!r}")
        counters["source"] += 1
        config["sources"][name or f"source{counters['source']}"] = {"type": typ}

    prev = list(config["sources"])
    for name, typ in items(parts[1]):
        if typ not in TRANSFORM_TYPES:
            raise ValueError(f"unknown transform type {typ!r}")
        counters["transform"] += 1
        cname = name or f"transform{counters['transform']}"
        config["transforms"][cname] = {
            "type": typ,
            "inputs": list(prev),
            **_GEN_TRANSFORM_DEFAULTS.get(typ, {}),
        }
        prev = [cname]

    for name, typ in items(parts[2]):
        if typ not in SINK_TYPES and typ not in BUILTIN_SINKS:
            raise ValueError(f"unknown sink type {typ!r}")
        counters["sink"] += 1
        config["sinks"][name or f"sink{counters['sink']}"] = {
            "type": typ,
            "inputs": list(prev),
        }

    return {k: v for k, v in config.items() if v}


def _cmd_generate_schema() -> int:
    """`vector generate-schema` (experimental in the reference too,
    src/cli.rs:285-291): a JSON Schema for the config surface — section
    layout, per-component `type` enums from the live registries, and the
    wiring keys the compiler enforces (`inputs`, non-empty). Per-type
    option fields stay open (additionalProperties) exactly because the
    compiler validates them at build time with typed errors."""
    from vector_spark.plans.sink_registry import BUILTIN_SINKS, SINK_TYPES
    from vector_spark.plans.source_registry import SOURCE_TYPES
    from vector_spark.plans.topology import TRANSFORM_TYPES

    def component(types: list[str], wired: bool) -> dict:
        props: dict = {"type": {"enum": sorted(types)}}
        required = ["type"]
        if wired:
            props["inputs"] = {
                "type": "array",
                "items": {"type": "string"},
                "minItems": 1,
            }
            required.append("inputs")
        return {
            "type": "object",
            "properties": props,
            "required": required,
            "additionalProperties": True,
        }

    def section(comp: dict) -> dict:
        return {"type": "object", "additionalProperties": comp}

    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "vector_spark topology config",
        "type": "object",
        "properties": {
            "sources": section(component(sorted(SOURCE_TYPES), wired=False)),
            "transforms": section(component(list(TRANSFORM_TYPES), wired=True)),
            "sinks": section(
                component(sorted(set(SINK_TYPES) | set(BUILTIN_SINKS)), wired=True)
            ),
            "enrichment_tables": {"type": "object"},
            "tests": {"type": "array"},
        },
        "additionalProperties": True,
    }
    print(json.dumps(schema, indent=2))
    return 0


def _cmd_list(args: list[str]) -> int:
    from vector_spark.plans.sink_registry import BUILTIN_SINKS, SINK_TYPES
    from vector_spark.plans.source_registry import SOURCE_TYPES
    from vector_spark.plans.topology import TRANSFORM_TYPES

    sections = {
        "sources": sorted(SOURCE_TYPES),
        "transforms": sorted(TRANSFORM_TYPES),
        "sinks": sorted(set(SINK_TYPES) | set(BUILTIN_SINKS)),
    }
    if "--format" in args and args[args.index("--format") + 1] == "json":
        print(json.dumps(sections, indent=2))
    else:
        for title, names in sections.items():
            print(f"{title.capitalize()}:")
            for n in names:
                print(f"- {n}")
            print()
    return 0


def _cmd_vrl(args: list[str]) -> int:
    import os

    from vector_spark.session import get_spark
    from vector_spark.vrl import remap_program

    prog_arg = args[0]
    source = (
        open(prog_arg).read() if os.path.exists(prog_arg) else prog_arg
    )
    input_path = None
    if "--input" in args:
        input_path = args[args.index("--input") + 1]
    lines = (
        open(input_path).read().splitlines()
        if input_path
        else sys.stdin.read().splitlines()
    )
    lines = [ln for ln in lines if ln.strip()]
    if not lines:
        print("no input events", file=sys.stderr)
        return 2

    spark = get_spark("vector_spark_vrl")
    try:
        from pyspark.sql import functions as F

        df = spark.read.json(
            spark.sparkContext.parallelize(lines, min(len(lines), 8))
        )
        outs = remap_program(df, source)
        res = outs["primary"]
        if res is not None:
            cols = [c for c in res.columns if not c.startswith(("__", "%"))]
            for row in res.select(
                F.to_json(F.struct(*cols), {"ignoreNullFields": "false"})
            ).collect():
                print(row[0])
        return 0
    finally:
        spark.stop()


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cmd = sys.argv[1]

    if cmd == "list":
        return _cmd_list(sys.argv[2:])
    if cmd == "generate-schema":
        return _cmd_generate_schema()
    if cmd == "vrl":
        return _cmd_vrl(sys.argv[2:])
    if cmd == "generate":
        expr = sys.argv[2]
        fmt = "toml"
        if "--format" in sys.argv:
            fmt = sys.argv[sys.argv.index("--format") + 1]
        print(_emit_config(_parse_generate_expr(expr), fmt))
        return 0
    if cmd == "datasheet":
        # corpus DATASHEET.md from the distributed report operators
        # (dataprep/report.py) — see tools/make_datasheet.py
        if len(sys.argv) < 4:
            print("usage: python -m vector_spark datasheet <dir> <out.md>")
            return 2
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                             "tools")
        )
        from make_datasheet import main as _ds_main

        return _ds_main(["datasheet", sys.argv[2], sys.argv[3]])

    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cfg_path = sys.argv[2]

    from vector_spark.plans.topology import load_config, load_config_dir

    if cmd == "config":
        # reference `vector config`: resolved single-JSON view of a config
        # file or directory (src/cli.rs:294-296)
        import os

        config = (
            load_config_dir(cfg_path)
            if os.path.isdir(cfg_path)
            else load_config(cfg_path)
        )
        print(json.dumps(config, indent=2, sort_keys=True, default=str))
        return 0
    if cmd == "convert-config":
        config = load_config(cfg_path)
        out_path = sys.argv[3]
        fmt = out_path.rsplit(".", 1)[-1]
        text = _emit_config(config, fmt)
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out_path}")
        return 0

    config = load_config(cfg_path)

    if cmd == "graph":
        print(_dot(config))
        return 0

    from vector_spark.plans import compile_config, run_unit_test
    from vector_spark.session import get_spark

    spark = get_spark("vector_spark_cli")
    try:
        if cmd == "validate":
            topo = compile_config(spark, config)
            # resolve every sink lazily — Catalyst analysis IS the typecheck
            for name, df in topo.outputs().items():
                _ = df.schema
                print(f"OK sink {name}: {df.schema.simpleString()}")
            return 0
        if cmd == "run":
            topo = compile_config(spark, config)
            print(json.dumps(topo.write_sinks()))
            return 0
        if cmd == "top":
            # `vector top` parity (src/top/dashboard.rs): execute the
            # topology, then print the per-component flow-counter table
            topo = compile_config(spark, config, observe=True)
            topo.write_sinks()
            rows = topo.top()
            if rows:
                w = max(len(r["component_id"]) for r in rows)
                for r in rows:
                    counters = " ".join(
                        f"{k}={v}"
                        for k, v in r.items()
                        if k not in ("component_id", "kind", "type")
                    )
                    print(
                        f"{r['component_id']:<{w}}  {r['kind']:<9} "
                        f"{r['type']:<18} {counters}"
                    )
            return 0
        if cmd == "tap":
            from vector_spark.plans.topology import tap

            topo = compile_config(spark, config)
            patterns = sys.argv[3:] or ["*"]
            for line in tap(topo, patterns, limit=10, meta=True):
                print(line)
            return 0
        if cmd == "test":
            spec = json.load(open(sys.argv[3]))
            inserts = {
                k: spark.createDataFrame(
                    [tuple(r) for r in v["rows"]], v["schema"]
                )
                for k, v in spec["inserts"].items()
            }
            results = run_unit_test(spark, config, inserts, spec["extracts"])
            print(json.dumps(results))
            ok = all(all(r["passed"]) for r in results.values())
            return 0 if ok else 1
        print(f"unknown command {cmd!r}")
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
