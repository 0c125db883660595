"""Topology: config (TOML/YAML/JSON/dict) → validated DAG → DataFrames.

Parity with the reference's config pipeline (SURVEY.md §3.1):
- load (src/config/loading) ≙ :func:`load_config` (tomllib/yaml/json/dict);
- compile (src/config/compiler.rs:9-80: name checks, input resolution,
  shape validation, Graph build, typecheck, cycle detection) ≙
  :func:`compile_config` — names unique across sections, every input
  resolves to a component output port, DAG acyclic (Kahn), sinks have
  inputs, reserved port names respected;
- build/run (src/topology/builder.rs) ≙ :meth:`Topology.outputs` — the
  "execution" is just composing lazy DataFrames; Catalyst plans, actions
  execute. Multi-input components union-by-name (the reference's implicit
  stream merge); named ports address multi-output transforms
  (``"route_comp.errors"``).

The `vector test` harness (src/config/unit_test/mod.rs:99-156) ≙
:func:`run_unit_test`: inject DataFrames at ``insert_at`` targets, read any
component's output, assert VRL-ish conditions.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark import tables
from vector_spark.conditions import compile_condition, to_column
from vector_spark.operators import (
    aggregate_metrics,
    dedupe,
    enrich,
    exclusive_route,
    filter_events,
    log_to_metric,
    metric_to_log,
    reduce_events,
    remap,
    route,
    sample,
    tag_cardinality_limit,
    throttle,
)

RESERVED_PORTS = {"_unmatched", "_default", "dropped"}


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------


_VAR_RE = None


def interpolate_vars(text: str, env: dict[str, str] | None = None) -> str:
    """Environment-variable interpolation at config-load time — exact
    reference semantics (src/config/vars.rs): ``$VAR``, ``${VAR}``,
    ``${VAR-default}`` (default on unset), ``${VAR:-default}`` (default on
    unset-or-empty), ``${VAR?err}`` / ``${VAR:?err}`` (required), ``$$``
    escapes a literal ``$``. Raises ValueError listing every miss."""
    import os
    import re as _re

    global _VAR_RE
    if _VAR_RE is None:
        _VAR_RE = _re.compile(
            r"\$\$|\$([\w.]+)|\$\{([\w.]+)(?:(:?-|:?\?)([^}]*))?\}"
        )
    env = os.environ if env is None else env
    errors: list[str] = []

    def sub(m: "_re.Match[str]") -> str:
        name = m.group(1) or m.group(2)
        if name is None:
            return "$"  # the $$ escape
        flags = m.group(3) or ""
        arg = m.group(4) or ""
        val = env.get(name)
        if flags == ":-":
            return val if val else arg
        if flags == "-":
            return val if val is not None else arg
        if flags == ":?":
            if val:
                return val
            errors.append(f"non-empty env var required: {name} ({arg})")
            return ""
        if flags == "?":
            if val is not None:
                return val
            errors.append(f"env var required: {name} ({arg})")
            return ""
        if val is None:
            errors.append(f"missing env var in config: {name}")
            return ""
        return val

    out = _VAR_RE.sub(sub, text)
    if errors:
        raise ValueError("; ".join(errors))
    return out


def load_config(path_or_dict) -> dict:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    p = Path(path_or_dict)
    text = interpolate_vars(p.read_text())
    if p.suffix == ".toml":
        import tomllib

        parse = tomllib.loads
    elif p.suffix in (".yaml", ".yml"):
        import yaml

        parse = yaml.safe_load
    elif p.suffix == ".json":
        parse = json.loads
    else:
        raise ValueError(f"unsupported config format: {p.suffix}")
    # SECRET[backend.key] placeholders resolve just after env-var
    # interpolation (src/config/loading/secret.rs:92-101); backend file
    # paths are relative to the config's directory
    from vector_spark.plans.secrets import resolve_config_secrets

    text = resolve_config_secrets(text, parse, base=p.parent)
    return parse(text)


_CONFIG_EXTS = (".toml", ".yaml", ".yml", ".json")
_NAMESPACED_SECTIONS = ("sources", "transforms", "sinks", "enrichment_tables")


def load_config_dir(path) -> dict:
    """Directory config loading (reference src/config/loading):

    - every config file at the top level merges into one config; a key
      defined in two files is an error (tests/config-dir/globals-duplicate)
    - non-config files are ignored (tests/config-dir/ignore-unknown)
    - namespaced subdirs ``sources/ transforms/ sinks/ enrichment_tables/``
      turn each ``NAME.toml`` into the component NAME
      (tests/namespacing/success); ``tests/`` files each hold one unit
      test; unknown subdirs are ignored (tests/namespacing/ignore-invalid)
    """
    p = Path(path)

    def merge(dst: dict, src: dict, ctx: list[str]) -> None:
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v, ctx + [k])
            elif k in dst:
                raise ValueError(
                    f"duplicate config key {'.'.join(ctx + [k])!r} across files"
                )
            else:
                dst[k] = v

    merged: dict = {}
    for f in sorted(p.iterdir()):
        if f.is_file() and f.suffix in _CONFIG_EXTS:
            merge(merged, load_config(f), [])
    for section in _NAMESPACED_SECTIONS:
        d = p / section
        if not d.is_dir():
            continue
        for f in sorted(d.iterdir()):
            if f.suffix not in _CONFIG_EXTS:
                continue
            name = f.stem
            dst = merged.setdefault(section, {})
            if name in dst:
                raise ValueError(f"duplicate component {section}.{name!r}")
            dst[name] = load_config(f)
    tests_dir = p / "tests"
    if tests_dir.is_dir():
        for f in sorted(tests_dir.iterdir()):
            if f.suffix in _CONFIG_EXTS:
                merged.setdefault("tests", []).append(load_config(f))
    return merged


# --------------------------------------------------------------------------
# graph validation (≙ compiler.rs + graph.rs typecheck/cycle check)
# --------------------------------------------------------------------------


@dataclass
class Topology:
    spark: SparkSession
    config: dict
    order: list[str]  # topological order of transforms
    _cache: dict[str, DataFrame] = field(default_factory=dict)
    overrides: dict[str, DataFrame] = field(default_factory=dict)
    observe: bool = False
    _observations: dict = field(default_factory=dict)
    # staged streaming: when set, a stateful streaming transform whose
    # lineage already holds a stateful operator materializes its input to
    # this directory first (availableNow parquet stage) and streams on —
    # the reference's inter-component disk buffer, Spark-shaped
    staging_root: str | None = None
    # per-component streaming lineage flags: (has_any_stateful, has_apply)
    _stream_state: dict = field(default_factory=dict)

    # -- resolution --------------------------------------------------------

    def _source_df(self, name: str) -> DataFrame:
        if name in self.overrides:
            return self.overrides[name]
        cfg = self.config.get("sources", {})[name]
        t = cfg["type"]
        if t == "sequences":
            df = tables.sequences(self.spark, int(cfg.get("n", 1000)))
            if cfg.get("derived", True):
                df = tables.with_message(df)
            return df
        if t == "parquet":
            df = self.spark.read.parquet(cfg["path"])
            # single-row-group fixture files plan as ONE scan task; spread
            # like Iceberg split planning would (tables.load docstring)
            if cfg.get("spread", True):
                goal = self.spark.sparkContext.defaultParallelism
                if tables._planned_splits(cfg["path"]) < goal:
                    df = df.repartition(goal)
            return df
        if t == "csv":
            return self.spark.read.csv(
                cfg["path"], header=cfg.get("header", True), schema=cfg.get("schema")
            )
        if t == "json":
            return self.spark.read.json(cfg["path"], schema=cfg.get("schema"))
        if t == "inline":
            return self.spark.createDataFrame(cfg["rows"], cfg["schema"])
        if t == "static_metrics":
            # reference src/sources/static_metrics.rs: config-defined
            # metrics emitted once per interval tick (default namespace
            # "static", default interval 1 s). Batch analog: `ticks`
            # intervals' worth of emissions with a deterministic
            # per-tick offset instead of wall-clock now().
            ns = cfg.get("namespace", "static")
            ticks = int(cfg.get("ticks", 1))
            interval = float(cfg.get("interval_secs", 1.0))
            rows = []
            for tick in range(ticks):
                for mc in cfg.get("metrics", []):
                    ((mtype, inner),) = mc["value"].items()
                    if mtype not in ("counter", "gauge"):
                        raise ValueError(
                            f"static_metrics value type {mtype!r} not "
                            "supported (counter/gauge)"
                        )
                    rows.append((
                        tick, tick * interval, mc["name"], ns,
                        mc.get("kind", "absolute"), mtype,
                        dict(mc.get("tags", {})), float(inner["value"]),
                    ))
            return self.spark.createDataFrame(
                rows,
                "tick int, offset_secs double, name string, "
                "namespace string, kind string, metric_type string, "
                "tags map<string,string>, value double",
            )
        from vector_spark.plans.source_registry import SOURCE_TYPES

        if t in SOURCE_TYPES:
            # reference source types execute via the land-then-decode
            # registry (payload reader × gate-verified decoder module)
            return SOURCE_TYPES[t](self.spark, cfg)
        raise ValueError(f"unknown source type {t!r}")

    def _enrichment_table(self, name: str) -> DataFrame:
        """Load a `[enrichment_tables.X]` file table (the reference's
        src/enrichment_tables/file.rs): CSV with optional header and a
        `schema` type map coercing columns (integer/float/bool/date/
        timestamp|fmt)."""
        tables = self.config.get("enrichment_tables", {})
        if name not in tables:
            raise ValueError(f"unknown enrichment table {name!r}")
        t = tables[name]
        if t.get("type", "file") != "file":
            raise ValueError(f"enrichment table type {t.get('type')!r} unsupported")
        fs = t.get("file", {})
        enc = fs.get("encoding", {})
        reader = self.spark.read.option(
            "header", str(enc.get("include_headers", True)).lower()
        ).option("delimiter", enc.get("delimiter", ","))
        dim = reader.csv(fs["path"])
        for col_name, typ in t.get("schema", {}).items():
            if typ == "integer":
                dim = dim.withColumn(col_name, F.col(col_name).cast("long"))
            elif typ == "float":
                dim = dim.withColumn(col_name, F.col(col_name).cast("double"))
            elif typ == "bool":
                dim = dim.withColumn(col_name, F.col(col_name).cast("boolean"))
            elif typ == "date":
                dim = dim.withColumn(col_name, F.col(col_name).cast("date"))
            elif typ.startswith("timestamp"):
                fmt = typ.split("|", 1)[1] if "|" in typ else None
                if fmt:
                    from vector_spark.vrl import strftime_to_java

                    dim = dim.withColumn(
                        col_name,
                        F.to_timestamp(F.col(col_name), strftime_to_java(fmt)),
                    )
                else:
                    dim = dim.withColumn(
                        col_name, F.col(col_name).cast("timestamp")
                    )
        return dim

    def _inputs_df(self, inputs: list[str]) -> DataFrame:
        dfs = [self.resolve(i) for i in inputs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def resolve(self, ref: str) -> DataFrame:
        """Resolve a component reference (``name`` or ``name.port``)."""
        if ref in self._cache:
            return self._cache[ref]
        name, port = (ref.split(".", 1) + [None])[:2] if "." in ref else (ref, None)
        if name in self.config.get("sources", {}) or name in self.overrides:
            if port:
                raise ValueError(f"sources have no ports: {ref}")
            df = self._source_df(name)
            if self.observe:
                stype = (
                    self.config.get("sources", {}).get(name, {}).get("type")
                    or "override"
                )
                df = self._observe(df, name, "source", stype, "sent")
        elif name in self.config.get("transforms", {}):
            outs = self._transform_outputs(name)
            key = port or "__default"
            if key not in outs:
                raise ValueError(
                    f"component {name!r} has no output port {port!r}; "
                    f"ports: {sorted(outs)}"
                )
            df = outs[key]
        else:
            raise ValueError(f"unknown component {name!r}")
        self._cache[ref] = df
        return df

    # -- transforms --------------------------------------------------------

    # -- staged streaming ----------------------------------------------------

    def _lineage_flags(self, refs: list[str]) -> tuple[bool, bool]:
        """(any stateful upstream, any applyInPandasWithState upstream)
        across the given input refs (ports share their transform's flags)."""
        any_state = any_apply = False
        for ref in refs:
            s, a = self._stream_state.get(ref.split(".", 1)[0], (False, False))
            any_state, any_apply = any_state or s, any_apply or a
        return any_state, any_apply

    def _materialize_stream(self, name: str, df: DataFrame) -> DataFrame:
        """Flush a streaming frame to a parquet stage (availableNow, own
        checkpoint) and stream it back — cuts the query so the next
        stateful operator starts a fresh plan. At the 10^12 tier this is
        a checkpointed cluster-FS hop between pipeline stages, the exact
        role of the reference's disk buffers (buffers/disk in
        vector.dev's model): bounded state per query, restartable at
        every cut."""
        import os

        assert self.staging_root is not None
        path = os.path.join(self.staging_root, f"stage_{name}")
        ck = os.path.join(self.staging_root, f"__ck_stage_{name}")
        q = (
            df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.spark.readStream.schema(df.schema).parquet(path)

    def _transform_outputs(self, name: str) -> dict[str, DataFrame]:
        cache_key = f"__outs__{name}"
        if cache_key in self._cache:
            return self._cache[cache_key]  # type: ignore[return-value]
        cfg = self.config["transforms"][name]
        df = self._inputs_df(cfg["inputs"])
        if df.isStreaming:
            kind = _streaming_stateful_kind(cfg)
            up_state, up_apply = self._lineage_flags(cfg["inputs"])
            # Spark admits ONE applyInPandasWithState per streaming query
            # (and none alongside other stateful ops) — cut the plan at
            # the boundary with a parquet stage when staging is enabled
            needs_cut = (kind == "apply" and up_state) or (
                kind == "builtin" and up_apply
            )
            if needs_cut and self.staging_root:
                df = self._materialize_stream(name, df)
                up_state = up_apply = False
            self._stream_state[name] = (
                up_state or kind is not None,
                up_apply or kind == "apply",
            )
        if cfg.get("type") == "enrich" and "table" in cfg:
            # reference shape: the transform references a top-level
            # [enrichment_tables.X] by name
            cfg = {**cfg, "__dim": self._enrichment_table(cfg["table"])}
        if (
            cfg.get("type") == "remap"
            and "enrichment_table" in cfg.get("source", "")
            and self.config.get("enrichment_tables")
        ):
            # VRL enrichment lookups need the dim ROWS at compile time —
            # legitimate only because enrichment tables are broadcastable
            # by contract (they inline as literal-map lookups)
            cfg = {
                **cfg,
                "__tables": {
                    n: [r.asDict() for r in self._enrichment_table(n).collect()]
                    for n in self.config["enrichment_tables"]
                },
            }
        outs = _build_transform(name, cfg, df)
        if self.observe:
            outs = {
                k: self._observe(
                    v,
                    name if k == "__default" else f"{name}.{k}",
                    "transform",
                    cfg["type"],
                    "sent",
                )
                for k, v in outs.items()
            }
        if cfg.get("persist"):
            # Spark-level persist, not just plan-object reuse: an output
            # consumed by several downstream components (or re-read inside
            # a two-pass operator like exact_dedup / pack_sequences) would
            # otherwise re-EXECUTE its whole upstream subtree per consumer.
            # Opt-in per component — exactly where a user materializes an
            # intermediate table in a real pipeline.
            outs = {k: v.persist() for k, v in outs.items()}
        self._cache[cache_key] = outs  # type: ignore[assignment]
        return outs

    # -- internal metrics (`vector top` counters) ---------------------------

    def _observe(
        self, df: DataFrame, cid: str, kind: str, ctype: str, direction: str
    ) -> DataFrame:
        """Attach flow counters to a component edge via Spark's
        CollectMetrics (``DataFrame.observe``): the aggregates are computed
        over the rows that actually flow through the edge DURING the next
        action — zero extra jobs, unlike a ``count()`` probe that would
        re-execute the upstream subtree. This is the Spark-native analog
        of the reference's internal telemetry counters
        (component_sent/received_events_total, src/top/state.rs:110-125)."""
        from pyspark.sql import Observation

        metrics = [F.count(F.lit(1)).alias(f"{direction}_events_total")]
        if "message" in df.columns:
            metrics.append(
                F.coalesce(F.sum(F.octet_length("message")), F.lit(0)).alias(
                    f"{direction}_bytes_total"
                )
            )
        obs = Observation()
        self._observations[(cid, kind, ctype)] = obs
        return df.observe(obs, *metrics)

    def top(self) -> list[dict]:
        """Per-component flow-counter snapshot — `vector top` parity
        (src/top/state.rs ComponentRow: kind, type,
        received/sent_events_total; src/top/dashboard.rs renders the
        table). Only components whose observation has FIRED (an action
        consumed their edge) are reported; a component observed but never
        executed is omitted rather than blocking. Throughput-per-sec
        columns are meaningless for a finished batch and are omitted.

        Counters reflect the FIRST action through each edge (Spark
        Observation semantics) — a snapshot, exactly what `top` shows."""
        # Observed metrics are delivered on the async listener bus AFTER the
        # action returns; drain it so a just-finished write is visible, then
        # probe each Observation's future non-blockingly (Observation.get
        # would hang forever on an edge no action ever consumed).
        try:
            self.spark._jsparkSession.sparkContext().listenerBus().waitUntilEmpty(
                10_000
            )
        except Exception:
            pass  # non-classic session (connect) — futures still resolve
        rows = []
        for (cid, kind, ctype), obs in self._observations.items():
            jo = getattr(obs, "_jo", None)
            if jo is None or not jo.future().isCompleted():
                continue  # never attached, or attached but no action yet
            rows.append(
                {"component_id": cid, "kind": kind, "type": ctype, **obs.get}
            )
        return sorted(rows, key=lambda r: (r["kind"], r["component_id"]))

    # -- sinks -------------------------------------------------------------

    def outputs(self) -> dict[str, DataFrame]:
        """Resolve every sink's input DataFrame (lazy — no action run)."""
        out = {}
        for sname, cfg in self.config.get("sinks", {}).items():
            out[sname] = self._inputs_df(cfg["inputs"])
        return out

    def write_sinks(self) -> dict[str, int | str]:
        """Execute every sink: parquet (templated partitioned path),
        console, blackhole (noop), memory (row count)."""
        results: dict[str, int | str] = {}
        for sname, cfg in self.config.get("sinks", {}).items():
            df = self._inputs_df(cfg["inputs"])
            t = cfg.get("type", "blackhole")
            if self.observe:
                df = self._observe(df, sname, "sink", t, "received")
            if t == "parquet":
                w = df.write.mode(cfg.get("mode", "overwrite"))
                if cfg.get("partition_by"):
                    w = w.partitionBy(*cfg["partition_by"])
                w.parquet(cfg["path"])
                if cfg.get("compact"):
                    # post-write bin-packing rewrite (Delta OPTIMIZE /
                    # Iceberg rewriteDataFiles posture) — see sinks/compact.py
                    from vector_spark.sinks.compact import compact

                    st = compact(
                        self.spark, cfg["path"],
                        target_mb=int(cfg.get("compact_target_mb", 128)),
                    )
                    results[sname] = (
                        f"{cfg['path']} (compacted "
                        f"{st['files_before']}->{st['files_after']})"
                    )
                else:
                    results[sname] = cfg["path"]
            elif t == "console":
                df.show(int(cfg.get("n", 20)), truncate=False)
                results[sname] = "console"
            elif t == "blackhole":
                df.write.format("noop").mode("overwrite").save()
                results[sname] = "blackhole"
            elif t == "memory":
                results[sname] = df.count()
            elif t == "encoded_file":
                line = _encoded_line(df, cfg)
                df.select(line.alias("value")).write.mode(
                    cfg.get("mode", "overwrite")
                ).text(cfg["path"])
                results[sname] = cfg["path"]
            else:
                # vendor sink types: ENCODE-THEN-SHIP — the registry
                # renders exact wire payloads (plans/sink_registry.py);
                # the landing write is the transport hand-off point.
                from vector_spark.plans.sink_registry import (
                    SINK_TYPES, encode_sink,
                )

                if t not in SINK_TYPES:
                    raise ValueError(f"unknown sink type {t!r}")
                enc = encode_sink(df, cfg)
                if cfg.get("path"):
                    w = enc.write.mode(cfg.get("mode", "overwrite"))
                    if "__key" in enc.columns:
                        w = w.partitionBy("__key")
                    w.text(cfg["path"])
                    results[sname] = cfg["path"]
                else:
                    results[sname] = enc.count()
        return results


def _encoded_line(df: DataFrame, cfg: dict) -> Column:
    """``encoded_file`` sink: one wire-format line per event.

    ``encoding``: ``json`` (sorted-key event object, the reference's
    file-sink json codec over a BTreeMap LogEvent), ``native_json``
    (the engine's own envelope), or ``logfmt``. ``fields`` optionally
    restricts the encoded columns (default: all)."""
    enc = cfg.get("encoding", "json")
    cols = sorted(cfg.get("fields") or df.columns)
    struct = F.struct(*[F.col(c) for c in cols])
    if enc == "json":
        return F.to_json(struct)
    if enc == "native_json":
        from vector_spark.functions.native_json import encode_native_log

        return encode_native_log(F.to_json(struct))
    if enc == "logfmt":
        from vector_spark.functions.crypto import encode_key_value

        m = F.map_from_arrays(
            F.array(*[F.lit(c) for c in cols]),
            F.array(*[F.col(c).cast("string") for c in cols]),
        )
        return encode_key_value(m)
    raise ValueError(f"unknown encoded_file encoding {enc!r}")


def _streaming_stateful_kind(cfg: dict) -> str | None:
    """How this transform type holds state on a stream: ``"apply"`` =
    applyInPandasWithState (at most one per streaming query), ``"builtin"``
    = native stateful operator (watermark dedupe / windowed agg), None =
    stateless column program."""
    t = cfg["type"]
    if t == "sample":
        return None if cfg.get("key_field") else "apply"
    if t in ("throttle", "tag_cardinality_limit"):
        return "apply"
    if t == "reduce":
        has_conditions = (
            cfg.get("ends_when") or cfg.get("starts_when") or cfg.get("max_events")
        )
        return "apply" if has_conditions else "builtin"
    if t == "aggregate":
        return "apply" if cfg.get("mode") == "diff" else "builtin"
    if t == "dedupe":
        return "builtin"
    return None


def _build_streaming_stateful(
    cfg: dict, df: DataFrame
) -> dict[str, DataFrame] | None:
    """Streaming dispatch for the stateful transform types (the reference
    runs EVERY transform on streams; src/topology/builder.rs). Batch
    implementations of these compile to window functions / multi-pass
    aggregates that Spark's analyzer rejects on a streaming frame, so a
    topology whose inputs are streams substitutes the
    ``streaming/stream.py`` counterpart with the SAME config keys.
    Returns None for configs that are stream-safe as-is (stateless column
    programs, keyed hash-mode sample) — the batch builder handles those
    unchanged.
    """
    from vector_spark.streaming.stream import (
        stream_aggregate,
        stream_aggregate_diff,
        stream_dedupe,
        stream_reduce,
        stream_reduce_sessions,
        stream_sample,
        stream_tag_cardinality,
        stream_throttle,
    )

    t = cfg["type"]
    ts_col = cfg.get("ts_col", "event_ts")
    if t == "sample":
        if cfg.get("key_field"):
            return None  # keyed hash mode is a stateless filter
        return {
            "__default": stream_sample(
                df,
                rate=int(cfg["rate"]),
                group_by=cfg.get("group_by"),
                order_by=cfg.get("order_by", ts_col),
                exclude=cfg.get("exclude"),
            )
        }
    if t == "throttle":
        if not cfg.get("key_field"):
            raise ValueError(
                "streaming throttle needs key_field (a global stream "
                "counter cannot scale; key the limiter)"
            )
        return {
            "__default": stream_throttle(
                df,
                threshold=int(cfg["threshold"]),
                window_secs=int(cfg["window_secs"]),
                key_field=cfg["key_field"],
                ts_col=ts_col,
            )
        }
    if t == "dedupe":
        fields = cfg.get("fields", {})
        match = cfg.get("match", fields.get("match"))
        ignore = cfg.get("ignore", fields.get("ignore"))
        if match is None:
            match = [c for c in df.columns if c not in set(ignore or [])]
        return {
            "__default": stream_dedupe(
                df,
                match=list(match),
                ts_col=ts_col,
                watermark=cfg.get("stream_watermark", "10 minutes"),
            )
        }
    if t == "reduce":
        if cfg.get("ends_when") or cfg.get("starts_when") or cfg.get("max_events"):
            group = cfg.get("group_by", [])
            if isinstance(group, list):
                if len(group) != 1:
                    raise ValueError(
                        "streaming condition-driven reduce takes exactly "
                        "one group_by column"
                    )
                group = group[0]
            return {
                "__default": stream_reduce(
                    df,
                    group_by=group,
                    merge_strategies=cfg.get("merge_strategies", {}),
                    ts_col=ts_col,
                    ends_when=cfg.get("ends_when"),
                    starts_when=cfg.get("starts_when"),
                    max_events=cfg.get("max_events"),
                    expire_after_secs=cfg.get("expire_after_secs"),
                    watermark=cfg.get("stream_watermark", "30 seconds"),
                )
            }
        # pure gap sessions → session_window; merge strategies that map to
        # built-in aggregates ride along
        aggs = {
            c: how
            for c, how in cfg.get("merge_strategies", {}).items()
            if how in ("sum", "max", "min", "count")
        }
        return {
            "__default": stream_reduce_sessions(
                df,
                group_by=cfg.get("group_by", []),
                gap_secs=int(cfg.get("expire_after_secs", 30)),
                ts_col=ts_col,
                watermark=cfg.get("stream_watermark", "30 seconds"),
                aggs=aggs or None,
            )
        }
    if t == "aggregate":
        mode = cfg.get("mode", "sum")
        if mode == "diff":
            series = cfg["series_cols"]
            if isinstance(series, list):
                if len(series) != 1:
                    raise ValueError(
                        "streaming diff aggregate takes exactly one "
                        "series column"
                    )
                series = series[0]
            return {
                "__default": stream_aggregate_diff(
                    df,
                    series_col=series,
                    value_col=cfg.get("value_col", "value"),
                    ts_col=ts_col,
                    interval_secs=int(cfg.get("interval_secs", 10)),
                )
            }
        return {
            "__default": stream_aggregate(
                df,
                series_cols=cfg["series_cols"],
                value_col=cfg.get("value_col", "value"),
                ts_col=ts_col,
                interval_secs=int(cfg.get("interval_secs", 10)),
                watermark=cfg.get("stream_watermark", "30 seconds"),
                mode=mode,
            )
        }
    if t == "tag_cardinality_limit":
        out = df
        for tag in cfg["tag_cols"]:
            out = stream_tag_cardinality(
                out,
                tag,
                value_limit=int(cfg.get("value_limit", 500)),
                action=cfg.get("action", "drop_tag"),
                order_by=cfg.get("order_by", ts_col),
            )
        return {"__default": out}
    return None


def _build_transform(name: str, cfg: dict, df: DataFrame) -> dict[str, DataFrame]:
    t = cfg["type"]
    if df.isStreaming:
        streaming_out = _build_streaming_stateful(cfg, df)
        if streaming_out is not None:
            return streaming_out
    if t == "filter":
        return {"__default": filter_events(df, cfg["condition"])}
    if t == "remap":
        common = dict(
            drop_on_error=cfg.get("drop_on_error", True),
            reroute_dropped=cfg.get("reroute_dropped", False),
            component_id=name,
            drop_on_abort=cfg.get("drop_on_abort", True),
        )
        if "source" in cfg:
            # the reference's native config shape: a VRL program string
            # (remap.rs:100-118), compiled by vector_spark.vrl
            from vector_spark.vrl import remap_program

            outs = remap_program(
                df,
                cfg["source"],
                enrichment_tables=cfg.get("__tables"),
                **common,
            )
        else:
            assignments = {
                k: F.expr(v) for k, v in cfg.get("assign", {}).items()
            }
            outs = remap(
                df,
                assignments,
                error_when=cfg.get("error_when"),
                abort_when=cfg.get("abort_when"),
                **common,
            )
        res = {"__default": outs["primary"]}
        if "dropped" in outs:
            res["dropped"] = outs["dropped"]
        return res
    if t == "route":
        # accept both our shape (routes = {name: condition}) and the
        # reference TOML shape ([transforms.X.route.NAME] condition tables)
        routes = cfg.get("routes") or cfg["route"]
        outs = route(df, routes, cfg.get("reroute_unmatched", True))
        res = {k: v for k, v in outs.items()}
        res["__default"] = df  # route has no default port in the reference;
        # keep the passthrough for convenience but named ports are the API
        return res
    if t == "exclusive_route":
        labeled = exclusive_route(df, cfg["routes"])
        res = {"__default": labeled}
        for rname in list(cfg["routes"]) + ["_unmatched"]:
            res[rname] = labeled.filter(F.col("route") == rname).drop("route")
        return res
    if t == "sample":
        return {
            "__default": sample(
                df,
                rate=int(cfg["rate"]),
                key_field=cfg.get("key_field"),
                group_by=cfg.get("group_by"),
                order_by=cfg.get("order_by"),
                exclude=cfg.get("exclude"),
            )
        }
    if t == "throttle":
        return {
            "__default": throttle(
                df,
                threshold=int(cfg["threshold"]),
                window_secs=int(cfg["window_secs"]),
                key_field=cfg.get("key_field"),
                ts_col=cfg.get("ts_col", "event_ts"),
                exclude=cfg.get("exclude"),
                tie_breakers=cfg.get("tie_breakers"),
            )
        }
    if t == "script":
        # escape hatch ≙ reference lua transform (src/transforms/lua):
        # batched init/process/shutdown hooks over Arrow batches
        from vector_spark.operators.script import script_transform

        return {
            "__default": script_transform(
                df,
                process=cfg["process"],
                init=cfg.get("init"),
                shutdown=cfg.get("shutdown"),
                schema=cfg.get("schema"),
            )
        }
    if t == "dedupe":
        # accept both our flat shape and the reference's `fields.match` /
        # `fields.ignore` TOML tables (dedupe/config defaults)
        fields = cfg.get("fields", {})
        return {
            "__default": dedupe(
                df,
                match=cfg.get("match", fields.get("match")),
                ignore=cfg.get("ignore", fields.get("ignore")),
                order_by=cfg.get("order_by"),
            )
        }
    if t == "reduce":
        return {
            "__default": reduce_events(
                df,
                group_by=cfg.get("group_by", []),
                merge_strategies=cfg.get("merge_strategies", {}),
                order_by=cfg["order_by"],
                expire_after_secs=cfg.get("expire_after_secs"),
                ts_col=cfg.get("ts_col", "event_ts"),
                ends_when=cfg.get("ends_when"),
                starts_when=cfg.get("starts_when"),
                max_events=cfg.get("max_events"),
                auto_merge=cfg.get("auto_merge", False),
            )
        }
    if t == "aggregate":
        return {
            "__default": aggregate_metrics(
                df,
                series_cols=cfg["series_cols"],
                value_col=cfg.get("value_col", "value"),
                ts_col=cfg.get("ts_col", "event_ts"),
                interval_secs=int(cfg.get("interval_secs", 10)),
                mode=cfg.get("mode", "sum"),
                kind_col=cfg.get("kind_col"),
            )
        }
    if t == "log_to_metric":
        return {
            "__default": log_to_metric(
                df,
                metric_type=cfg["metric_type"],
                name=cfg["name"],
                field=cfg.get("field"),
                increment_by_value=cfg.get("increment_by_value", False),
                namespace=cfg.get("namespace", ""),
                tag_cols=cfg.get("tag_cols"),
                ts_col=cfg.get("ts_col", "event_ts"),
            )
        }
    if t == "metric_to_log":
        return {"__default": metric_to_log(df, cfg.get("metric_cols"))}
    if t == "tag_cardinality_limit":
        return {
            "__default": tag_cardinality_limit(
                df,
                tag_cols=cfg["tag_cols"],
                value_limit=int(cfg.get("value_limit", 500)),
                action=cfg.get("action", "drop_tag"),
                order_by=cfg.get("order_by", "event_ts"),
            )
        }
    if t == "enrich":
        if "__dim" in cfg:  # resolved from [enrichment_tables.X]
            dim = cfg["__dim"]
        elif "rows" in cfg:
            dim = df.sparkSession.createDataFrame(cfg["rows"], cfg["schema"])
        else:
            dim = df.sparkSession.read.parquet(cfg["path"])
        return {
            "__default": enrich(
                df,
                dim,
                on=cfg["on"],
                select=cfg.get("select"),
                case_insensitive=cfg.get("case_insensitive", False),
                required=cfg.get("required", False),
            )
        }
    if t == "quality_filter":
        # corpus curation as config: quality + Gopher repetition filters
        from vector_spark.dataprep import text as tx

        from vector_spark.functions.objects import let

        text_col = cfg.get("text_col", "text")

        # let-bind the tokenization: the combined predicate references
        # the words array many times and pushdown would re-inline a
        # materialized column into the filter (see objects.let)
        def _pred(ws):
            keep = F.lit(True)
            if "min_quality" in cfg:
                keep = keep & (
                    tx.quality_score(F.col(text_col), ws=ws)
                    >= float(cfg["min_quality"])
                )
            if cfg.get("repetition_ok", False):
                rep = tx.repetition_features(F.col(text_col), ws=ws)
                keep = keep & rep["rep_ok"]
            return keep

        return {
            "__default": df.filter(let(tx.words(F.col(text_col)), _pred))
        }
    if t == "exact_dedup":
        from vector_spark.dataprep.dedup import exact_dedup

        return {
            "__default": exact_dedup(
                df,
                text_col=cfg.get("text_col", "text"),
                id_col=cfg.get("id_col", "doc_id"),
            )
        }
    if t == "decontaminate":
        from vector_spark.dataprep.contamination import (
            contamination_scores,
            token_contamination_scores,
        )

        spark = df.sparkSession
        if "benchmark_rows" in cfg:
            bench = spark.createDataFrame(
                cfg["benchmark_rows"], cfg["benchmark_schema"]
            )
        elif "benchmark_sequences_n" in cfg:
            # deterministic generator benchmark (tests/gates)
            from vector_spark import tables as _tables

            bench = _tables.sequences(
                spark, int(cfg["benchmark_sequences_n"])
            )
        else:
            bench = spark.read.parquet(cfg["benchmark_path"])
        if "tokens_col" in cfg:
            # pre-tokenized corpora: token n-gram collision (int64 folds)
            scores = token_contamination_scores(
                df, bench, tokens_col=cfg["tokens_col"],
                n=int(cfg.get("ngram", 8)),
            )
        else:
            scores = contamination_scores(
                df, bench, text_col=cfg.get("text_col", "text"),
                n=int(cfg.get("ngram", 5)),
            )
        tau = float(cfg.get("max_contamination", 0.5))
        keep = scores.filter(F.col("contamination") < tau).select("doc_id")
        return {"__default": df.join(keep, "doc_id")}
    if t == "split_assign":
        from vector_spark.dataprep.mixing import split_assign

        out = split_assign(
            df,
            fractions=cfg.get("fractions"),
            key_col=cfg.get("key_col", "doc_id"),
            salt=cfg.get("salt", "split"),
        )
        if "keep" in cfg:  # route one split onward (e.g. keep: train)
            out = out.filter(F.col("split") == cfg["keep"]).drop("split")
        return {"__default": out}
    if t == "containment_filter":
        # drop documents wholly contained in a larger one (quotes,
        # mirrored boilerplate, article inclusion) — the asymmetric
        # counterpart of near_dedup's symmetric similarity drop
        from vector_spark.dataprep.dedup import containment_filter

        return {
            "__default": containment_filter(
                df,
                text_col=cfg.get("text_col", "text"),
                id_col=cfg.get("id_col", "doc_id"),
                k=int(cfg.get("ngram", 16)),
                w=int(cfg.get("window", 8)),
                min_ratio=float(cfg.get("min_ratio", 0.7)),
                min_fps=int(cfg.get("min_fps", 4)),
                fp_cap=int(cfg.get("fp_cap", 100)),
            )
        }
    if t == "domain_cap":
        # at most N docs per URL host (anti-domination) — see
        # dataprep/urls.py::per_domain_cap
        from vector_spark.dataprep.urls import per_domain_cap

        return {
            "__default": per_domain_cap(
                df,
                cap=int(cfg["cap"]),
                url_col=cfg.get("url_col", "url"),
                id_col=cfg.get("id_col", "doc_id"),
                margin=int(cfg.get("margin", 4)),
            )
        }
    if t == "crawl_dedup":
        # keep the latest fetch per canonical URL (crawl-over-crawl
        # page identity) — see dataprep/urls.py::crawl_dedup
        from vector_spark.dataprep.urls import crawl_dedup

        return {
            "__default": crawl_dedup(
                df,
                url_col=cfg.get("url_col", "url"),
                id_col=cfg.get("id_col", "doc_id"),
                ts_col=cfg.get("ts_col"),
            )
        }
    if t == "soft_dedup":
        # keep near-duplicates, weight 1/|cluster| — pair generation
        # exactly like `near_dedup`/`leak_safe_split` (text or token
        # minhash), then mixing.dup_weights
        from vector_spark.dataprep.dedup import (
            minhash_near_dups,
            token_minhash_near_dups,
        )
        from vector_spark.dataprep.mixing import dup_weights

        id_col = cfg.get("key_col", "doc_id")
        common = dict(
            id_col=id_col,
            num_hashes=int(cfg.get("num_hashes", 16)),
            bands=int(cfg.get("bands", 4)),
            threshold=float(cfg.get("threshold", 0.6)),
            max_bucket=cfg.get("max_bucket"),
        )
        if "tokens_col" in cfg:
            pairs = token_minhash_near_dups(
                df, tokens_col=cfg["tokens_col"],
                n=int(cfg.get("ngram", 8)), **common,
            )
        else:
            pairs = minhash_near_dups(
                df, text_col=cfg.get("text_col", "text"),
                k_shingle=int(cfg.get("ngram", 3)), **common,
            )
        return {
            "__default": dup_weights(
                df, pairs, id_col=id_col,
                max_iters=int(cfg.get("max_iters", 20)),
            )
        }
    if t == "leak_safe_split":
        # duplicate-cluster-aware split as config: generate near-dup
        # pairs exactly like `near_dedup` (text or token mode), then
        # assign every near-dup family its representative's hash bucket
        # (mixing.leakage_safe_split) so duplicates never straddle
        # train/val; `keep` routes one split onward like `split_assign`
        from vector_spark.dataprep.dedup import (
            minhash_near_dups,
            token_minhash_near_dups,
        )
        from vector_spark.dataprep.mixing import leakage_safe_split

        id_col = cfg.get("key_col", "doc_id")
        common = dict(
            id_col=id_col,
            num_hashes=int(cfg.get("num_hashes", 16)),
            bands=int(cfg.get("bands", 4)),
            threshold=float(cfg.get("threshold", 0.6)),
            max_bucket=cfg.get("max_bucket"),
        )
        if "tokens_col" in cfg:
            pairs = token_minhash_near_dups(
                df, tokens_col=cfg["tokens_col"],
                n=int(cfg.get("ngram", 8)), **common,
            )
        else:
            pairs = minhash_near_dups(
                df, text_col=cfg.get("text_col", "text"),
                k_shingle=int(cfg.get("ngram", 3)), **common,
            )
        out = leakage_safe_split(
            df,
            pairs,
            fractions=cfg.get("fractions"),
            key_col=id_col,
            salt=cfg.get("salt", "split"),
            max_iters=int(cfg.get("max_iters", 20)),
        )
        if "keep" in cfg:
            out = out.filter(F.col("split") == cfg["keep"]).drop(
                "split", "split_key"
            )
        return {"__default": out}
    if t == "pack_tokens":
        from vector_spark.dataprep.packing import pack_tokens

        return {
            "__default": pack_tokens(
                df,
                tokens_col=cfg.get("tokens_col", "tokens"),
                count_col=cfg.get("count_col", "n_tok"),
                seq_len=int(cfg["seq_len"]),
                order_col=cfg.get("order_col", "_i"),
                bucket_size=int(cfg.get("bucket_size", 8192)),
            )
        }
    if t == "rate_anomaly":
        from vector_spark.operators.anomaly import (
            rate_zscores,
            rate_zscores_dense,
            seasonal_zscores,
        )

        fn = {
            "flat": rate_zscores,
            "dense": rate_zscores_dense,
            "seasonal": seasonal_zscores,
        }[cfg.get("baseline", "flat")]
        out = fn(
            df,
            key_col=cfg.get("key_field", "event_type"),
            ts_col=cfg.get("ts_col", "ts"),
            window_secs=int(cfg.get("window_secs", 600)),
        )
        if cfg.get("emit") == "incidents":
            from vector_spark.operators.anomaly import anomaly_incidents

            return {
                "__default": anomaly_incidents(
                    out,
                    threshold=float(cfg.get("min_abs_z", 2.0)),
                    window_secs=int(cfg.get("window_secs", 600)),
                )
            }
        if "min_abs_z" in cfg:
            out = out.filter(F.abs(F.col("z")) >= float(cfg["min_abs_z"]))
        return {"__default": out}
    if t == "self_repetition":
        from vector_spark.dataprep.tokens import self_repetition

        scored = self_repetition(
            df,
            id_col=cfg.get("id_col", "doc_id"),
            tokens_col=cfg.get("tokens_col", "tokens"),
            n=int(cfg.get("ngram", 8)),
        )
        out = df.join(
            scored.select(cfg.get("id_col", "doc_id"), "rep_frac"),
            cfg.get("id_col", "doc_id"),
        )
        if "max_repetition" in cfg:
            out = out.filter(F.col("rep_frac") <= float(cfg["max_repetition"]))
        return {"__default": out}
    if t == "novelty":
        from vector_spark.dataprep.contamination import token_novelty_scores

        spark = df.sparkSession
        if "reference_rows" in cfg:
            ref = spark.createDataFrame(
                cfg["reference_rows"], cfg["reference_schema"]
            )
        else:
            ref = spark.read.parquet(cfg["reference_path"])
        scored = token_novelty_scores(
            df,
            ref,
            tokens_col=cfg.get("tokens_col", "tokens"),
            n=int(cfg.get("ngram", 8)),
        )
        out = df.join(scored.select("doc_id", "novelty"), "doc_id")
        if "min_novelty" in cfg:
            out = out.filter(F.col("novelty") >= float(cfg["min_novelty"]))
        return {"__default": out}
    if t == "group_sample":
        from vector_spark.dataprep.mixing import group_sample

        return {
            "__default": group_sample(
                df,
                k=int(cfg["k"]),
                group_col=cfg.get("group_by", "source"),
                id_col=cfg.get("id_col", "doc_id"),
                margin=int(cfg.get("margin", 4)),
            )
        }
    if t == "curriculum":
        from vector_spark.dataprep.mixing import curriculum_order
        from vector_spark.dataprep.tokens import pow2_bucket

        bucket_col = cfg.get("bucket_col")
        if bucket_col is None:
            # default difficulty = power-of-two length bucket
            df = df.withColumn(
                "bucket_len",
                pow2_bucket(F.col(cfg.get("count_col", "n_tok")).cast("long")),
            )
            bucket_col = "bucket_len"
        return {
            "__default": curriculum_order(
                df,
                bucket_col,
                key_col=cfg.get("key_col", "doc_id"),
                epoch=int(cfg.get("epoch", 0)),
            )
        }
    if t == "strided_chunks":
        from vector_spark.dataprep.tokens import strided_chunks

        return {
            "__default": strided_chunks(
                df,
                width=int(cfg["width"]),
                stride=int(cfg.get("stride", cfg["width"])),
                id_col=cfg.get("id_col", "doc_id"),
                tokens_col=cfg.get("tokens_col", "tokens"),
                n_tok_col=cfg.get("count_col", "n_tok"),
            )
        }
    if t == "near_dedup":
        # MinHash near-dup DROP: pairs → connected components → keep the
        # min-id representative per cluster (plus all singletons)
        from vector_spark.dataprep.dedup import (
            dup_clusters,
            minhash_near_dups,
            token_minhash_near_dups,
        )

        id_col = cfg.get("id_col", "doc_id")
        common = dict(
            id_col=id_col,
            num_hashes=int(cfg.get("num_hashes", 16)),
            bands=int(cfg.get("bands", 4)),
            threshold=float(cfg.get("threshold", 0.6)),
            max_bucket=cfg.get("max_bucket"),
        )
        if "tokens_col" in cfg:
            pairs = token_minhash_near_dups(
                df, tokens_col=cfg["tokens_col"],
                n=int(cfg.get("ngram", 8)), **common,
            )
        else:
            pairs = minhash_near_dups(
                df, text_col=cfg.get("text_col", "text"),
                k_shingle=int(cfg.get("ngram", 3)), **common,
            )
        drop = (
            dup_clusters(pairs)
            .filter(F.col("member") != F.col("cluster"))
            .select(F.col("member").alias(id_col))
        )
        return {"__default": df.join(drop, id_col, "left_anti")}
    if t == "lm_perplexity":
        # corpus curation as config: CCNet-style LM quality filter — train
        # an add-k unigram LM on the in-corpus reference subset selected
        # by ref_condition, stamp each doc's perplexity, optionally filter
        from vector_spark.dataprep import lm as lmod

        id_col = cfg.get("id_col", "doc_id")
        ref = df.filter(to_column(cfg["ref_condition"]))
        if "tokens_col" in cfg:
            # token-native path (corpora that ship only ids): integer
            # keys end-to-end, interpolated bigram scoring
            tokens_col = cfg["tokens_col"]
            uni = lmod.token_unigram_lm(
                ref, tokens_col, vocab_size=int(cfg.get("vocab_size", 4096))
            )
            bi = lmod.token_bigram_lm(
                ref, tokens_col, bigram_size=int(cfg.get("bigram_size", 16384))
            )
            scored = lmod.token_cross_entropy_bigram(
                df, uni, bi, tokens_col, id_col
            )
        else:
            text_col = cfg.get("text_col", "text")
            uni = lmod.unigram_lm(
                ref, text_col, vocab_size=int(cfg.get("vocab_size", 4096))
            )
            scored = lmod.doc_cross_entropy(df, uni, text_col, id_col)
        out = df.join(scored.select(id_col, "ppl"), id_col)
        if "max_ppl" in cfg:
            out = out.filter(F.col("ppl") <= float(cfg["max_ppl"]))
        return {"__default": out}
    if t == "pack_sequences":
        from vector_spark.dataprep.packing import pack_sequences

        count_col = cfg.get("count_col")
        if count_col is None:
            # text corpora: derive whitespace token counts in-config
            from vector_spark.dataprep.text import token_count

            count_col = "n_tok_doc"
            df = df.withColumn(
                count_col, token_count(F.col(cfg.get("text_col", "text")))
            )
        return {
            "__default": pack_sequences(
                df,
                count_col=count_col,
                seq_len=int(cfg["seq_len"]),
                order_col=cfg.get("order_col", "doc_id"),
                bucket_size=int(cfg.get("bucket_size", 8192)),
            )
        }
    if t == "tokenize":
        # corpus curation as config: BPE subword tokenization — train on
        # the input corpus (the dim-bounded collect documented in
        # dataprep/bpe.py) or load a pre-trained merge list, then stamp
        # every row with the tokens payload
        from vector_spark.dataprep import bpe

        text_col = cfg.get("text_col", "text")
        id_col = cfg.get("id_col", "doc_id")
        if "merges" in cfg:
            # pre-trained: a merge list + the alphabet it was trained over
            merges = [tuple(m) for m in cfg["merges"]]
            vocab = bpe.bpe_vocab(merges, list(cfg["alphabet"]))
        else:
            wc = bpe.word_counts(
                df, text_col, top_v=int(cfg.get("top_v", 50_000))
            ).cache()
            merges = bpe.bpe_train(
                wc, num_merges=int(cfg.get("num_merges", 200))
            )
            vocab = bpe.bpe_vocab(merges, bpe.corpus_alphabet(wc))
        enc = bpe.bpe_encode(df, merges, vocab, text_col, id_col)
        return {"__default": df.join(enc, id_col)}
    if t == "paragraph_dedup":
        from vector_spark.dataprep.dedup import paragraph_dedup

        return {
            "__default": paragraph_dedup(
                df,
                text_col=cfg.get("text_col", "text"),
                id_col=cfg.get("id_col", "doc_id"),
                seg_words=int(cfg.get("seg_words", 10)),
            )
        }
    if t == "sample_mixture":
        from vector_spark.dataprep.mixing import (
            hash_threshold_mixture,
            sample_mixture,
        )

        total = int(cfg["total"])
        src = cfg.get("source_col", "source")
        key = cfg.get("key_col", "doc_id")
        if cfg.get("mode", "exact") == "exact":
            # exact largest-remainder quotas (one per-source window sort)
            return {
                "__default": sample_mixture(
                    df, cfg["weights"], total, source_col=src, key_col=key
                )
            }
        # "threshold": the no-shuffle scale path; weights optional
        # (temperature-derived from counts when omitted)
        return {
            "__default": hash_threshold_mixture(
                df,
                total,
                alpha=float(cfg.get("alpha", 1.0)),
                weights=cfg.get("weights"),
                source_col=src,
                key_col=key,
            )
        }
    if t == "trace_assembly":
        from vector_spark.operators.traces import trace_assembly

        return {
            "__default": trace_assembly(
                df,
                trace_col=cfg.get("trace_col", "trace_id"),
                parent_col=cfg.get("parent_col", "parent_span_id"),
                start_col=cfg.get("start_col", "start_ts"),
                end_col=cfg.get("end_col", "end_ts"),
                name_col=cfg.get("name_col", "name"),
                service_col=cfg.get("service_col"),
                status_col=cfg.get("status_col", "status_code"),
            )
        }
    if t == "spike_attribution":
        from vector_spark.operators.anomaly import spike_attribution

        return {
            "__default": spike_attribution(
                df,
                key_col=cfg.get("key_field", "event_type"),
                ts_col=cfg.get("ts_col", "ts"),
                window_secs=int(cfg.get("window_secs", 3600)),
                top_k=int(cfg.get("top_k", 3)),
            )
        }
    if t == "dataset_card":
        from vector_spark.dataprep.report import dataset_card

        return {
            "__default": dataset_card(
                df,
                source_col=cfg.get("source_col", "source"),
                text_col=cfg.get("text_col", "text"),
                lang_col=cfg.get("lang_col", "lang")
                if cfg.get("lang_col", "lang") else None,
            )
        }
    if t == "token_budget":
        from vector_spark.dataprep.mixing import token_budget_trim

        return {
            "__default": token_budget_trim(
                df,
                budget=int(cfg["budget"]),
                source_col=cfg.get("source_col", "source"),
                n_tok_col=cfg.get("n_tok_col", "n_tok"),
                key_col=cfg.get("key_col", "doc_id"),
                salt=cfg.get("salt", "budget"),
            )
        }
    if t == "quality_percentile":
        from vector_spark.dataprep.text import (
            quality_percentile_filter,
            quality_score,
        )

        score_col = cfg.get("score_col")
        if score_col is None:
            df = df.withColumn(
                "quality", quality_score(F.col(cfg.get("text_col", "text")))
            )
            score_col = "quality"
        return {
            "__default": quality_percentile_filter(
                df,
                keep_frac=float(cfg["keep_frac"]),
                score_col=score_col,
                group_col=cfg.get("group_by", "source"),
                id_col=cfg.get("id_col", "doc_id"),
            )
        }
    if t == "url_filter":
        from vector_spark.dataprep.urls import blocklist_filter, blocklist_mark

        spark = df.sparkSession
        if "blocked_domains" in cfg:
            bl = spark.createDataFrame(
                [(d,) for d in cfg["blocked_domains"]], "domain string"
            )
        else:
            bl = spark.read.parquet(cfg["blocklist_path"])
        fn = blocklist_mark if cfg.get("mode") == "mark" else blocklist_filter
        return {
            "__default": fn(df, bl, url_col=cfg.get("url_col", "url"))
        }
    raise ValueError(f"unknown transform type {t!r}")


TRANSFORM_TYPES = (
    "filter remap route exclusive_route sample throttle dedupe reduce "
    "aggregate log_to_metric metric_to_log tag_cardinality_limit enrich script "
    "quality_filter exact_dedup decontaminate pack_sequences paragraph_dedup "
    "lm_perplexity tokenize "
    "sample_mixture split_assign leak_safe_split pack_tokens near_dedup "
    "group_sample curriculum strided_chunks self_repetition novelty "
    "rate_anomaly trace_assembly spike_attribution dataset_card url_filter "
    "containment_filter crawl_dedup domain_cap soft_dedup "
    "token_budget quality_percentile"
).split()


def compile_config(
    spark: SparkSession,
    config_or_path,
    overrides: dict[str, DataFrame] | None = None,
    observe: bool = False,
    staging_root: str | None = None,
) -> Topology:
    """Validate + compile a config into a Topology (≙ config::compile).

    Checks: unique names, known types, every input resolves, acyclic,
    sinks non-empty inputs. Raises ValueError with the reference's class of
    messages (unknown component / cycle detected / duplicate name).
    """
    config = load_config(config_or_path)
    sources = set(config.get("sources", {})) | set(overrides or {})
    transforms = config.get("transforms", {})
    sinks = config.get("sinks", {})

    dupes = sources & set(transforms) | (sources | set(transforms)) & set(sinks)
    if dupes:
        raise ValueError(f"duplicate component name(s): {sorted(dupes)}")

    for name, cfg in transforms.items():
        if cfg.get("type") not in TRANSFORM_TYPES:
            raise ValueError(f"transform {name!r}: unknown type {cfg.get('type')!r}")
        if not cfg.get("inputs"):
            raise ValueError(f"transform {name!r}: empty inputs")
    for name, cfg in sinks.items():
        if not cfg.get("inputs"):
            raise ValueError(f"sink {name!r}: empty inputs")

    # input resolution + cycle check over the transform graph (Kahn)
    def base(ref: str) -> str:
        return ref.split(".", 1)[0]

    known = sources | set(transforms)
    for name, cfg in {**transforms, **sinks}.items():
        for ref in cfg["inputs"]:
            if base(ref) not in known:
                raise ValueError(
                    f"component {name!r}: input {ref!r} does not resolve "
                    f"(known: {sorted(known)})"
                )

    indeg = {t: 0 for t in transforms}
    children: dict[str, list[str]] = {t: [] for t in transforms}
    for name, cfg in transforms.items():
        for ref in cfg["inputs"]:
            b = base(ref)
            if b in transforms:
                indeg[name] += 1
                children[b].append(name)
    queue = [t for t, d in indeg.items() if d == 0]
    order: list[str] = []
    while queue:
        n = queue.pop()
        order.append(n)
        for c in children[n]:
            indeg[c] -= 1
            if indeg[c] == 0:
                queue.append(c)
    if len(order) != len(transforms):
        cyc = sorted(t for t, d in indeg.items() if d > 0)
        raise ValueError(f"cycle detected involving: {cyc}")

    return Topology(
        spark,
        config,
        order,
        overrides=dict(overrides or {}),
        observe=observe,
        staging_root=staging_root,
    )


# --------------------------------------------------------------------------
# unit-test harness (≙ `vector test`, src/config/unit_test/mod.rs)
# --------------------------------------------------------------------------


def run_unit_test(
    spark: SparkSession,
    config_or_path,
    inserts: dict[str, DataFrame],
    extracts: dict[str, list[str] | list[Callable]],
) -> dict[str, dict]:
    """Inject DataFrames at source positions, evaluate conditions on
    component outputs. Returns per-extract {rows, passed:[bool per cond]}.

    A condition passes when EVERY output row satisfies it and at least one
    row was produced (the reference asserts per collected event)."""
    topo = compile_config(spark, config_or_path, overrides=inserts)
    results: dict[str, dict] = {}
    for ref, conds in extracts.items():
        df = topo.resolve(ref)
        n = df.count()
        passed = []
        for cond in conds:
            c = (
                to_column(cond)
                if isinstance(cond, (str, dict))
                else cond(df)
            )
            ok = n > 0 and df.filter(~F.coalesce(c, F.lit(False))).count() == 0
            passed.append(bool(ok))
        results[ref] = {"rows": n, "passed": passed}
    return results


def run_streaming(
    spark: SparkSession,
    config_or_path,
    source_streams: dict[str, DataFrame],
    checkpoint_root: str,
    query_prefix: str = "vs_stream",
) -> dict[str, int]:
    """Execute a topology config as Structured Streaming — the reference's
    native execution mode (every Vector topology IS a stream;
    src/topology/builder.rs spawns each component as a long-running task).

    ``source_streams`` maps each source name to a STREAMING DataFrame
    (``spark.readStream...``) with that source's output schema; the
    config's transforms and sink encoders then apply UNCHANGED — they are
    pure column programs, batch/stream agnostic (the same property
    pipeline.stream_pipeline relies on). Stateful transform types
    (sample counter mode / throttle / dedupe / reduce / aggregate /
    tag_cardinality_limit) are substituted with their
    ``streaming/stream.py`` counterparts automatically when the input
    frame is streaming (``_build_streaming_stateful``) — the SAME config
    keys drive both modes. One constraint inherited from Spark: a single
    streaming query admits at most one ``applyInPandasWithState``
    operator, so a config CHAINING two stateful transforms (e.g. sample →
    throttle) is CUT at the boundary automatically: the upstream stage
    flushes to a checkpointed parquet stage under
    ``checkpoint_root/__staging`` (availableNow) and the downstream
    operator streams from it (``Topology._materialize_stream``) — exactly
    the reference's inter-component disk buffer posture, Spark-shaped.
    Each stage is independently checkpointed and restartable.

    Each sink runs as its own checkpointed append-mode memory query with
    ``trigger(availableNow=True)`` — process everything pending, then
    stop (the batch-parity mode). Per-sink checkpoints live under
    ``checkpoint_root``/<sink>, giving the reference's per-component
    resume (checkpointer.rs) via Spark's commit log. Returns per-sink
    emitted-row counts — the north-rule invariant is that these equal
    the batch run's counts on the same input.
    """
    config = load_config(config_or_path)
    missing = set(config.get("sources", {})) - set(source_streams)
    if missing:
        raise ValueError(
            f"streaming run needs a source stream for: {sorted(missing)}"
        )
    import os

    topo = compile_config(
        spark,
        config,
        overrides=dict(source_streams),
        staging_root=os.path.join(checkpoint_root, "__staging"),
    )
    counts: dict[str, int] = {}
    for sink_name, df in topo.outputs().items():
        qname = f"{query_prefix}_{sink_name}"
        q = (
            df.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option(
                "checkpointLocation", f"{checkpoint_root}/{sink_name}"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        counts[sink_name] = spark.table(qname).count()
    return counts


def run_config_tests(spark: SparkSession, config_or_path) -> list[dict]:
    """Run a config's embedded ``[[tests]]`` sections — full `vector test`
    parity (src/config/unit_test/mod.rs): each test lists
    ``[[tests.inputs]]`` (``insert_at`` + ``value`` | ``log_fields``),
    ``[[tests.outputs]]`` (``extract_from`` + ``[[...conditions]]`` in
    either condition language), and optional ``no_outputs_from``.

    Semantics: each input is delivered INTO the named component (its
    configured inputs are replaced by the injected test frame, exactly
    like the reference rewires unit-test sources); an outputs block
    passes when at least one event reaches ``extract_from`` and EVERY
    event satisfies every condition; ``no_outputs_from`` components must
    produce zero events. Returns one dict per test:
    {name, passed, failures: [human-readable strings]}.
    """
    import copy

    config = load_config(config_or_path)
    tests = config.get("tests", [])
    results: list[dict] = []
    for t in tests:
        cfg = copy.deepcopy(
            {k: v for k, v in config.items() if k != "tests"}
        )
        inserts: dict[str, list[dict]] = {}
        for inp in t.get("inputs", []):
            at = inp["insert_at"]
            if "value" in inp:
                row = {"message": inp["value"]}
            else:
                row = dict(inp.get("log_fields", {}))
            inserts.setdefault(at, []).append(row)

        overrides: dict[str, DataFrame] = {}
        for at, rows in inserts.items():
            src = f"__insert_{at}"
            if at not in cfg.get("transforms", {}):
                raise ValueError(
                    f"test {t.get('name')!r}: insert_at {at!r} is not a "
                    f"transform"
                )
            cfg["transforms"][at]["inputs"] = [src]
            overrides[src] = spark.createDataFrame(
                _pd().DataFrame(rows)
            )

        # prune to the subgraph downstream of the injected inputs — the
        # reference builds the unit-test topology only from components on
        # paths between test inputs and outputs, so siblings with
        # unresolvable production sources don't block the test
        transforms = cfg.get("transforms", {})
        keep = set(inserts)
        grew = True
        while grew:
            grew = False
            for tname, tcfg in transforms.items():
                if tname in keep:
                    continue
                if any(ref.split(".", 1)[0] in keep for ref in tcfg["inputs"]):
                    keep.add(tname)
                    grew = True
        cfg["transforms"] = {k: v for k, v in transforms.items() if k in keep}
        cfg.pop("sinks", None)

        failures: list[str] = []
        try:
            topo = compile_config(spark, cfg, overrides=overrides)
        except ValueError as e:
            results.append(
                {"name": t.get("name"), "passed": False,
                 "failures": [f"compile error: {e}"]}
            )
            continue

        for out in t.get("outputs", []):
            ref = out["extract_from"]
            refs = ref if isinstance(ref, list) else [ref]
            for r in refs:
                df = topo.resolve(r)
                n = df.count()
                if n == 0:
                    failures.append(f"no events extracted from {r!r}")
                    continue
                for cond in out.get("conditions", []):
                    c = to_column(cond)
                    bad = df.filter(~F.coalesce(c, F.lit(False))).count()
                    if bad:
                        failures.append(
                            f"{r!r}: {bad}/{n} events fail condition "
                            f"{cond.get('source', cond)!r}"
                        )
        for ref in t.get("no_outputs_from", []):
            n = topo.resolve(ref).count()
            if n:
                failures.append(
                    f"{ref!r} produced {n} events, expected none"
                )
        results.append(
            {"name": t.get("name"), "passed": not failures,
             "failures": failures}
        )
    return results


def graph_dot(config_or_path) -> str:
    """Render the topology DAG as Graphviz DOT — `vector graph` parity
    (src/graph.rs:80-159): sources draw as ``trapezium``, transforms as
    ``diamond``, sinks as ``invtrapezium``; a port-qualified input
    (``name.port``) becomes an edge label; per-component
    ``graph.node_attributes`` in the config override the default shape
    (src/graph.rs:70-78). Pure config walk — no SparkSession needed."""
    cfg = load_config(config_or_path)

    def attrs(component_cfg: dict, default_shape: str) -> str:
        a = dict(component_cfg.get("graph", {}).get("node_attributes", {}))
        a.setdefault("shape", default_shape)
        return " ".join(f'{k}="{v}"' for k, v in sorted(a.items()))

    def edges(target: str, inputs: list[str]) -> list[str]:
        out = []
        for ref in inputs:
            name, _, port = ref.partition(".")
            if port:
                out.append(f'  "{name}" -> "{target}" [label="{port}"]')
            else:
                out.append(f'  "{name}" -> "{target}"')
        return out

    lines = ["digraph {"]
    for sid, scfg in cfg.get("sources", {}).items():
        lines.append(f'  "{sid}" [{attrs(scfg, "trapezium")}]')
    for tid, tcfg in cfg.get("transforms", {}).items():
        lines.append(f'  "{tid}" [{attrs(tcfg, "diamond")}]')
        lines.extend(edges(tid, tcfg.get("inputs", [])))
    for kid, kcfg in cfg.get("sinks", {}).items():
        lines.append(f'  "{kid}" [{attrs(kcfg, "invtrapezium")}]')
        lines.extend(edges(kid, kcfg.get("inputs", [])))
    lines.append("}")
    return "\n".join(lines)


def tap(
    topo: Topology,
    outputs_patterns,
    limit: int = 100,
    meta: bool = False,
    format: str = "json",
) -> list[str]:
    """Sample events at matching component outputs — `vector tap` parity
    (src/tap/cmd.rs:38-57; glob component matching ≙
    lib/vector-tap/src/controller.rs:315-347; the ``meta`` envelope ≙
    EventFormatter, lib/vector-tap/src/lib.rs:47-99).

    ``outputs_patterns`` are shell globs matched against source names,
    transform names (default port) and ``name.port`` named outputs. Up
    to ``limit`` events per matched output are returned as JSON (or
    logfmt) lines. Encoding is JVM-side (``DataFrame.toJSON`` on a
    ``limit(n)`` plan — Spark stops the scan after n rows; no Python row
    loop on the hot path). With ``meta=True`` each line is wrapped as
    ``{"component_id":…,"component_kind":…,"component_type":…,"event":…}``
    exactly like the reference's ``--meta`` JSON layout."""
    import fnmatch

    if isinstance(outputs_patterns, str):
        outputs_patterns = [outputs_patterns]
    if format not in ("json", "logfmt"):
        raise ValueError(f"unsupported tap format {format!r}")

    # addressable outputs: sources, plus every port of every transform
    refs: dict[str, tuple[str, str]] = {}
    for sname, scfg in topo.config.get("sources", {}).items():
        refs[sname] = ("source", scfg.get("type", "source"))
    for tname, tcfg in topo.config.get("transforms", {}).items():
        for port in topo._transform_outputs(tname):
            ref = tname if port == "__default" else f"{tname}.{port}"
            refs[ref] = ("transform", tcfg.get("type", "transform"))

    lines: list[str] = []
    for ref in sorted(refs):
        if not any(fnmatch.fnmatchcase(ref, p) for p in outputs_patterns):
            continue
        kind, ctype = refs[ref]
        for ev in topo.resolve(ref).limit(limit).toJSON().collect():
            if format == "logfmt":
                fields = json.loads(ev)
                body = " ".join(
                    f"{k}={json.dumps(v) if isinstance(v, str) else v}"
                    for k, v in fields.items()
                )
                lines.append(
                    f"component_id={ref} component_kind={kind} "
                    f"component_type={ctype} {body}"
                    if meta
                    else body
                )
            elif meta:
                lines.append(
                    f'{{"component_id":"{ref}","component_kind":"{kind}",'
                    f'"component_type":"{ctype}","event":{ev}}}'
                )
            else:
                lines.append(ev)
    return lines


def _pd():
    import pandas as pd

    return pd
