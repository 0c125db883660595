"""CLI (≙ reference subcommands, src/cli.rs:270-320):

    python -m vector_spark validate <config>     # compile + typecheck only
    python -m vector_spark graph <config>        # DOT graph of the DAG
    python -m vector_spark run <config>          # execute all sinks
    python -m vector_spark test <config> <spec>  # unit-test harness
    python -m vector_spark top <config>          # run + per-component counters
    python -m vector_spark tap <config> <glob>   # sample events at outputs

<config> is TOML/YAML/JSON. The test <spec> is JSON:
{"inserts": {comp: {"rows": [...], "schema": "..."}},
 "extracts": {comp_or_port: ["<condition>", ...]}}
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


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd, cfg_path = sys.argv[1], sys.argv[2]

    from vector_spark.plans.topology import load_config

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
