"""Every transform type must be constructible and runnable from config —
covers the topology registry branches end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.plans import compile_config


def _events_cfg(rows):
    return {
        "type": "inline",
        "rows": rows,
        "schema": "event_id long, ts_s string, event_type string, value double",
    }


ROWS = [
    (1, "2024-01-01 00:00:01", "click", 1.0),
    (2, "2024-01-01 00:00:02", "click", 2.0),
    (3, "2024-01-01 00:00:03", "error", 3.0),
    (4, "2024-01-01 01:30:00", "click", 4.0),
    (5, "2024-01-01 01:30:01", "error", 4.0),
]


def test_registry_all_transform_types(spark):
    config = {
        "sources": {"ev": _events_cfg(ROWS)},
        "transforms": {
            "ts": {
                "type": "remap",
                "inputs": ["ev"],
                "assign": {"event_ts": "to_timestamp(ts_s)"},
            },
            "flt": {"type": "filter", "inputs": ["ts"], "condition": ".value > 0"},
            "smp": {
                "type": "sample",
                "inputs": ["flt"],
                "rate": 1,
                "group_by": ["event_type"],
                "order_by": "event_id",
            },
            "thr": {
                "type": "throttle",
                "inputs": ["smp"],
                "threshold": 10,
                "window_secs": 3600,
                "key_field": "event_type",
                "tie_breakers": ["event_id"],
            },
            "ddp": {
                "type": "dedupe",
                "inputs": ["thr"],
                "match": ["event_id"],
            },
            "tcl": {
                "type": "tag_cardinality_limit",
                "inputs": ["ddp"],
                "tag_cols": ["event_type"],
                "value_limit": 10,
            },
            "enr": {
                "type": "enrich",
                "inputs": ["tcl"],
                "on": ["event_type"],
                "rows": [("click", "ui"), ("error", "ops")],
                "schema": "event_type string, team string",
            },
            "red": {
                "type": "reduce",
                "inputs": ["enr"],
                "group_by": ["event_type"],
                "merge_strategies": {"value": "sum"},
                "order_by": "event_id",
            },
            "l2m": {
                "type": "log_to_metric",
                "inputs": ["enr"],
                "metric_type": "counter",
                "name": "events_total",
                "tag_cols": ["event_type"],
            },
            "agg": {
                "type": "aggregate",
                "inputs": ["l2m"],
                "series_cols": ["event_type"],
                "interval_secs": 3600,
                "mode": "count",
            },
            "m2l": {"type": "metric_to_log", "inputs": ["agg"]},
        },
        "sinks": {
            "out_red": {"type": "memory", "inputs": ["red"]},
            "out_m2l": {"type": "memory", "inputs": ["m2l"]},
        },
    }
    topo = compile_config(spark, config)
    red = {r.event_type: r.value for r in topo.resolve("red").collect()}
    assert red == {"click": 7.0, "error": 7.0}
    m2l = topo.resolve("m2l").collect()
    # two series × two hour-windows = 4 metric rows, serialized to JSON
    assert len(m2l) == 4
    assert all(r.message.startswith("{") for r in m2l)
    agg = {
        (r.event_type, r.window_start.hour): r.agg_value
        for r in topo.resolve("agg").collect()
    }
    assert agg == {("click", 0): 2, ("error", 0): 1, ("click", 1): 1, ("error", 1): 1}


def test_registry_remap_dropped_port(spark):
    config = {
        "sources": {"ev": _events_cfg(ROWS)},
        "transforms": {
            "parse": {
                "type": "remap",
                "inputs": ["ev"],
                "assign": {"big": "try_cast(event_type as long)"},
                "error_when": "is_null(.big)",
                "drop_on_error": True,
                "reroute_dropped": True,
            }
        },
        "sinks": {"d": {"type": "memory", "inputs": ["parse.dropped"]}},
    }
    topo = compile_config(spark, config)
    dropped = topo.resolve("parse.dropped")
    assert dropped.count() == 5  # 'click'/'error' never cast to long
    assert dropped.select("metadata_dropped.component_id").first()[0] == "parse"


def test_curation_transform_types(spark, tmp_path):
    """quality_filter / exact_dedup / decontaminate / pack_sequences are
    first-class topology types composable from plain config."""
    from vector_spark.plans import compile_config

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30))),
         (2, " ".join(f"w{i}" for i in range(30))),   # exact dup of 1
         (3, "the quick brown fox jumps over the lazy dog today and more"),
         (4, "spam spam spam spam spam spam spam spam spam spam")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    config = {
        "sources": {"d": {"type": "parquet", "path": p}},
        "transforms": {
            "clean": {"type": "quality_filter", "inputs": ["d"],
                      "min_quality": 0.3, "repetition_ok": True},
            "uniq": {"type": "exact_dedup", "inputs": ["clean"]},
            "decon": {"type": "decontaminate", "inputs": ["uniq"],
                      "benchmark_rows": [
                          (99, "the quick brown fox jumps over the lazy dog today and more")],
                      "benchmark_schema": "doc_id long, text string",
                      "max_contamination": 0.5},
            "packed": {"type": "pack_sequences", "inputs": ["decon"],
                       "seq_len": 16, "bucket_size": 2},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["packed"]}},
    }
    topo = compile_config(spark, config)
    rows = {r.doc_id: r for r in topo.resolve("packed").collect()}
    # 4 dropped by repetition, 2 deduped into 1, 3 dropped as contaminated
    assert set(rows) == {1}
    assert rows[1].tok_start == 0 and rows[1].tok_end == 30
    assert rows[1].chunk_first == 0 and rows[1].chunk_last == 1


def test_token_curation_transform_types(spark):
    """near_dedup / decontaminate(tokens) / split_assign / pack_tokens are
    first-class topology types over pre-tokenized corpora."""
    base = list(range(100, 140))
    near = base[:-1] + [999]          # near-dup of doc 1 → dropped (min-id kept)
    bench_hit = list(range(100, 120))  # fully inside doc 1's grams
    far = list(range(5000, 5060))
    rows = [(1, base, len(base)), (2, near, len(near)), (3, far, len(far))]
    config = {
        "sources": {
            "seq": {
                "type": "inline",
                "rows": rows,
                "schema": "_i long, tokens array<int>, n_tok long",
            }
        },
        "transforms": {
            "dedup": {"type": "near_dedup", "inputs": ["seq"],
                      "tokens_col": "tokens", "id_col": "_i",
                      "ngram": 8, "threshold": 0.3},
            "decon": {"type": "decontaminate", "inputs": ["dedup"],
                      "tokens_col": "tokens", "ngram": 8,
                      "benchmark_rows": [(99, bench_hit)],
                      "benchmark_schema": "doc_id long, tokens array<int>",
                      "max_contamination": 0.3},
            "packed": {"type": "pack_tokens", "inputs": ["decon"],
                       "seq_len": 16, "order_col": "_i"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["packed"]}},
    }
    # decontaminate joins on doc_id — give the frame one
    config["transforms"]["decon_pre"] = {
        "type": "remap", "inputs": ["dedup"], "assign": {"doc_id": "_i"},
    }
    config["transforms"]["decon"]["inputs"] = ["decon_pre"]
    topo = compile_config(spark, config)
    out = {r.chunk_id: r for r in topo.resolve("packed").collect()}
    # doc 2 near-dup-dropped, doc 1 contaminated-dropped → only doc 3 packs
    assert sorted(out) == [0, 1, 2, 3]
    assert [out[k].n_fill for k in sorted(out)] == [16, 16, 16, 12]
    assert list(out[0].tokens) == far[:16]


def test_split_assign_transform_type(spark):
    config = {
        "sources": {
            "d": {
                "type": "inline",
                "rows": [(f"doc-{i}",) for i in range(300)],
                "schema": "doc_id string",
            }
        },
        "transforms": {
            "sp": {"type": "split_assign", "inputs": ["d"],
                   "fractions": {"train": 0.8, "val": 0.1, "test": 0.1}},
            "tr": {"type": "split_assign", "inputs": ["d"],
                   "fractions": {"train": 0.8, "val": 0.1, "test": 0.1},
                   "keep": "train"},
        },
        "sinks": {"a": {"type": "memory", "inputs": ["sp"]},
                  "b": {"type": "memory", "inputs": ["tr"]}},
    }
    topo = compile_config(spark, config)
    full = topo.resolve("sp").collect()
    train = topo.resolve("tr").collect()
    by_split = {r.doc_id: r.split for r in full}
    assert {r.doc_id for r in train} == {
        k for k, v in by_split.items() if v == "train"}
    assert "split" not in topo.resolve("tr").columns


def test_paragraph_dedup_and_mixture_transform_types(spark, tmp_path):
    """paragraph_dedup / sample_mixture are first-class topology types."""
    from vector_spark.plans import compile_config

    seg_a = " ".join(f"w{i}" for i in range(10))
    seg_b = " ".join(f"x{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{seg_a} {seg_b}", "s0"), (2, seg_a, "s0"), (3, seg_b, "s1")],
        "doc_id long, text string, source string",
    )
    p = str(tmp_path / "docs2")
    docs.write.parquet(p)
    config = {
        "sources": {"d": {"type": "parquet", "path": p}},
        "transforms": {
            "pdedup": {"type": "paragraph_dedup", "inputs": ["d"]},
            "mix_exact": {"type": "sample_mixture", "inputs": ["d"],
                          "total": 2, "weights": {"s0": 1.0, "s1": 1.0}},
            "mix_temp": {"type": "sample_mixture", "inputs": ["d"],
                         "total": 3, "mode": "threshold", "alpha": 0.5},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["pdedup"]}},
    }
    topo = compile_config(spark, config)
    pd_rows = {r.doc_id: r for r in topo.resolve("pdedup").collect()}
    assert pd_rows[1].n_kept == 2  # doc 1 owns both segments
    assert pd_rows[2].n_kept == 0 and pd_rows[3].n_kept == 0
    mix = topo.resolve("mix_exact").collect()
    assert len(mix) == 2  # one per source under equal weights
    assert {r.source for r in mix} == {"s0", "s1"}
    temp = topo.resolve("mix_temp").collect()
    assert all(r.source in {"s0", "s1"} for r in temp)


def test_tokenize_transform_type(spark, tmp_path):
    """tokenize (BPE) is a first-class topology type: corpus-trained and
    pre-trained (merges+alphabet in config) variants both round-trip."""
    from vector_spark.dataprep import bpe
    from vector_spark.plans import compile_config

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest news"), (3, "low news")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "docs3")
    docs.write.parquet(p)
    config = {
        "sources": {"d": {"type": "parquet", "path": p}},
        "transforms": {
            "tok": {"type": "tokenize", "inputs": ["d"], "num_merges": 40},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["tok"]}},
    }
    topo = compile_config(spark, config)
    rows = {r.doc_id: r for r in topo.resolve("tok").collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r.n_tok == len(r.tokens) > 0 for r in rows.values())

    # pre-trained path: reuse the merges the corpus run would produce
    wc = bpe.word_counts(docs)
    merges = bpe.bpe_train(wc, num_merges=40)
    alphabet = bpe.corpus_alphabet(wc)
    config["transforms"]["tok"] = {
        "type": "tokenize", "inputs": ["d"],
        "merges": [list(m) for m in merges], "alphabet": alphabet,
    }
    topo2 = compile_config(spark, config)
    rows2 = {r.doc_id: r for r in topo2.resolve("tok").collect()}
    assert {k: v.tokens for k, v in rows2.items()} == {
        k: v.tokens for k, v in rows.items()
    }


def test_static_metrics_source(spark):
    """static_metrics source type (reference src/sources/
    static_metrics.rs): config-defined metrics, one emission per tick,
    default namespace 'static', counter/gauge values, tag map."""
    from vector_spark.plans import compile_config

    config = {
        "sources": {
            "st": {
                "type": "static_metrics",
                "ticks": 3,
                "interval_secs": 5.0,
                "metrics": [
                    {"name": "build_info", "kind": "absolute",
                     "value": {"gauge": {"value": 1.0}},
                     "tags": {"team": "core"}},
                    {"name": "heartbeats", "kind": "incremental",
                     "value": {"counter": {"value": 2.0}}, "tags": {}},
                ],
            }
        },
        "transforms": {
            "g": {"type": "filter", "inputs": ["st"],
                  "condition": '.metric_type == "gauge"'},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["g"]}},
    }
    topo = compile_config(spark, config)
    all_rows = topo.resolve("st").collect()
    assert len(all_rows) == 6  # 2 metrics x 3 ticks
    assert {r.namespace for r in all_rows} == {"static"}
    hb = [r for r in all_rows if r.name == "heartbeats"]
    assert all(r.metric_type == "counter" and r.kind == "incremental"
               and r.value == 2.0 for r in hb)
    assert sorted(r.offset_secs for r in hb) == [0.0, 5.0, 10.0]
    gauges = topo.resolve("g").collect()
    assert len(gauges) == 3
    assert all(r.name == "build_info" and r.tags["team"] == "core"
               for r in gauges)


def test_sampling_curriculum_chunk_transform_types(spark):
    """group_sample / curriculum / strided_chunks are first-class topology
    types: a config can carve an eval set, order it easy-first, and cut
    eval windows without any Python."""
    rows = [
        (f"doc-{i:03d}", "a" if i < 30 else "b", list(range(i, i + 6 + i % 5)), 6 + i % 5)
        for i in range(40)
    ]
    config = {
        "sources": {
            "seq": {
                "type": "inline",
                "rows": rows,
                "schema": "doc_id string, source string, tokens array<int>, n_tok int",
            }
        },
        "transforms": {
            "carve": {"type": "group_sample", "inputs": ["seq"], "k": 5},
            "order": {"type": "curriculum", "inputs": ["carve"], "epoch": 1},
            "chunks": {"type": "strided_chunks", "inputs": ["carve"],
                       "width": 6, "stride": 3},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["order"]},
                  "out2": {"type": "memory", "inputs": ["chunks"]}},
    }
    from vector_spark.plans.topology import compile_config

    topo = compile_config(spark, config)
    ordered = topo.resolve("order").collect()
    assert len(ordered) == 10  # 5 per source
    assert sorted(r.position for r in ordered) == list(range(10))
    # easy-first: positions ascend with bucket_len
    by_pos = sorted(ordered, key=lambda r: r.position)
    assert [r.bucket_len for r in by_pos] == sorted(r.bucket_len for r in ordered)
    chunks = topo.resolve("chunks").collect()
    assert all(len(c.tokens) == c.n_ctx and c.n_ctx <= 6 for c in chunks)
    assert {c.doc_id for c in chunks} == {r.doc_id for r in topo.resolve("carve").collect()}


def test_lm_perplexity_tokens_mode(spark):
    """lm_perplexity with tokens_col scores and filters over token ids."""
    from vector_spark.plans.topology import compile_config

    rows = [(f"d{i}", [1, 2, 1, 2] if i < 8 else [77, 91, 33, 5], i)
            for i in range(10)]
    config = {
        "sources": {
            "seq": {"type": "inline", "rows": rows,
                    "schema": "doc_id string, tokens array<int>, _i long"}
        },
        "transforms": {
            "lm": {"type": "lm_perplexity", "inputs": ["seq"],
                   "tokens_col": "tokens", "ref_condition": "._i < 8",
                   "max_ppl": 5.0},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["lm"]}},
    }
    topo = compile_config(spark, config)
    kept = {r.doc_id for r in topo.resolve("lm").collect()}
    # the 8 in-distribution docs survive; the 2 outlier docs blow the cap
    assert kept == {f"d{i}" for i in range(8)}


def test_self_repetition_and_novelty_transform_types(spark):
    from vector_spark.plans.topology import compile_config

    loopy = [1, 2, 1, 2, 1, 2, 1, 2, 1, 2]
    clean = list(range(50, 60))
    old = list(range(200, 210))
    config = {
        "sources": {
            "seq": {"type": "inline",
                    "rows": [("loop", loopy), ("ok", clean), ("old", old)],
                    "schema": "doc_id string, tokens array<int>"}
        },
        "transforms": {
            "rep": {"type": "self_repetition", "inputs": ["seq"],
                    "ngram": 2, "max_repetition": 0.5},
            "nov": {"type": "novelty", "inputs": ["rep"], "ngram": 8,
                    "reference_rows": [("r", old)],
                    "reference_schema": "doc_id string, tokens array<int>",
                    "min_novelty": 0.5},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["nov"]}},
    }
    topo = compile_config(spark, config)
    assert {r.doc_id for r in topo.resolve("rep").collect()} == {"ok", "old"}
    assert {r.doc_id for r in topo.resolve("nov").collect()} == {"ok"}


def test_rate_anomaly_transform_type(spark):
    import datetime

    from vector_spark.plans.topology import compile_config

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for w in range(5):
        n = 60 if w == 4 else 10
        for i in range(n):
            rows.append((f"e{w}_{i}", "api",
                         t0 + datetime.timedelta(seconds=w * 600 + i)))
    config = {
        "sources": {
            "ev": {"type": "inline", "rows": rows,
                   "schema": "event_id string, event_type string, ts timestamp"}
        },
        "transforms": {
            "an": {"type": "rate_anomaly", "inputs": ["ev"],
                   "window_secs": 600, "min_abs_z": 1.5},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["an"]}},
    }
    topo = compile_config(spark, config)
    hits = topo.resolve("an").collect()
    assert len(hits) == 1 and hits[0].n == 60 and hits[0].z > 1.5
    # incidents mode rolls the hot windows into one page-worthy row
    config["transforms"]["an"]["emit"] = "incidents"
    config["transforms"]["an"]["min_abs_z"] = 1.5
    topo2 = compile_config(spark, config)
    inc = topo2.resolve("an").collect()
    assert len(inc) == 1 and inc[0].n_windows == 1 and inc[0].duration_secs == 600


def test_trace_assembly_and_spike_attribution_transform_types(spark):
    import datetime

    from vector_spark.plans.topology import compile_config

    t0 = datetime.datetime(2024, 1, 1)
    spans = [
        ("A", "s1", "", t0, t0 + datetime.timedelta(microseconds=300),
         "root-a", 0),
        ("A", "s2", "s1", t0 + datetime.timedelta(microseconds=10),
         t0 + datetime.timedelta(microseconds=120), "child", 2),
    ]
    config = {
        "sources": {
            "sp": {"type": "inline", "rows": spans,
                   "schema": ("trace_id string, span_id string, "
                              "parent_span_id string, start_ts timestamp, "
                              "end_ts timestamp, name string, "
                              "status_code int")}
        },
        "transforms": {
            "tr": {"type": "trace_assembly", "inputs": ["sp"]},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["tr"]}},
    }
    (r,) = compile_config(spark, config).resolve("tr").collect()
    assert (r.n_spans, r.n_errors, r.root_name, r.duration_us) == (
        2, 1, "root-a", 300,
    )

    evs = [("k1", t0)] * 2 + [("k2", t0)] * 2
    evs += [("k1", t0 + datetime.timedelta(hours=1))] * 8
    evs += [("k2", t0 + datetime.timedelta(hours=1))] * 2
    config2 = {
        "sources": {
            "ev": {"type": "inline", "rows": evs,
                   "schema": "event_type string, ts timestamp"}
        },
        "transforms": {
            "sa": {"type": "spike_attribution", "inputs": ["ev"],
                   "top_k": 1},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["sa"]}},
    }
    rows = sorted(compile_config(spark, config2).resolve("sa").collect(),
                  key=lambda r: r.window_start)
    assert rows[1].key == "k1" and rows[1].delta_share == 1.0


def test_dataset_card_and_url_filter_transform_types(spark):
    from vector_spark.plans.topology import compile_config

    docs = [
        (1, "same", "en", "a", "https://example.com/x"),
        (2, "same", "en", "a", "https://good.org/y"),
        (3, "other", "de", "b", "https://ads.example.com/z"),
    ]
    schema = ("doc_id long, text string, lang string, source string, "
              "url string")
    config = {
        "sources": {"d": {"type": "inline", "rows": docs, "schema": schema}},
        "transforms": {
            "card": {"type": "dataset_card", "inputs": ["d"]},
            "clean": {"type": "url_filter", "inputs": ["d"],
                      "blocked_domains": ["example.com"]},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["card"]},
                  "out2": {"type": "memory", "inputs": ["clean"]}},
    }
    topo = compile_config(spark, config)
    card = {r.source: r for r in topo.resolve("card").collect()}
    assert card["a"].n_dups == 1 and card["b"].n_dups == 0
    kept = topo.resolve("clean").collect()
    assert [r.doc_id for r in kept] == [2]  # both example.com hosts drop


def test_token_budget_and_quality_percentile_transform_types(spark):
    from vector_spark.plans.topology import compile_config

    rows = [(f"d{i}", "a", 10, "word " * (5 + i)) for i in range(6)]
    config = {
        "sources": {
            "s": {"type": "inline", "rows": rows,
                  "schema": ("doc_id string, source string, n_tok int, "
                             "text string")}
        },
        "transforms": {
            "budget": {"type": "token_budget", "inputs": ["s"],
                       "budget": 30},
            "best": {"type": "quality_percentile", "inputs": ["s"],
                     "keep_frac": 0.5},
        },
        "sinks": {"o1": {"type": "memory", "inputs": ["budget"]},
                  "o2": {"type": "memory", "inputs": ["best"]}},
    }
    topo = compile_config(spark, config)
    kept = topo.resolve("budget").collect()
    assert len(kept) == 3 and max(r.cum_tokens for r in kept) == 30
    best = topo.resolve("best").collect()
    assert len(best) == 3  # half of 6
    assert all("quality" in r.asDict() for r in best)


def test_crawl_dedup_transform_type(spark):
    from vector_spark.plans.topology import compile_config

    rows = [
        (1, "HTTPS://Ex.COM:443/a/?utm_source=x", 100),
        (2, "https://ex.com/a", 200),
        (3, "http://ex.com/b", 150),
    ]
    config = {
        "sources": {
            "s": {"type": "inline", "rows": rows,
                  "schema": "doc_id long, url string, fetch_ts long"}
        },
        "transforms": {
            "pages": {"type": "crawl_dedup", "inputs": ["s"],
                      "ts_col": "fetch_ts"},
        },
        "sinks": {"o": {"type": "memory", "inputs": ["pages"]}},
    }
    topo = compile_config(spark, config)
    out = {r.canon_url: r.doc_id for r in topo.resolve("pages").collect()}
    assert out == {"https://ex.com/a": 2, "http://ex.com/b": 3}


def test_domain_cap_transform_type(spark):
    from vector_spark.plans.topology import compile_config

    rows = [(i, f"https://h{i % 2}.com/p/{i}") for i in range(20)]
    config = {
        "sources": {
            "s": {"type": "inline", "rows": rows,
                  "schema": "doc_id long, url string"}
        },
        "transforms": {
            "capped": {"type": "domain_cap", "inputs": ["s"], "cap": 3},
        },
        "sinks": {"o": {"type": "memory", "inputs": ["capped"]}},
    }
    topo = compile_config(spark, config)
    out = topo.resolve("capped").collect()
    hosts = {}
    for r in out:
        hosts.setdefault(r.host, 0)
        hosts[r.host] += 1
    assert hosts == {"h0.com": 3, "h1.com": 3}


def test_soft_dedup_transform_type(spark):
    from vector_spark.plans.topology import compile_config

    base = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (1, base),
        (2, base.replace("today", "tomorrow")),
        (3, "completely different words entirely unrelated about engines"),
    ]
    config = {
        "sources": {
            "s": {"type": "inline", "rows": rows,
                  "schema": "doc_id long, text string"}
        },
        "transforms": {
            "w": {"type": "soft_dedup", "inputs": ["s"],
                  "threshold": 0.3},
        },
        "sinks": {"o": {"type": "memory", "inputs": ["w"]}},
    }
    topo = compile_config(spark, config)
    out = {r.doc_id: (r.cluster_size, r.dup_weight)
           for r in topo.resolve("w").collect()}
    assert out[1] == (2, 0.5) and out[2] == (2, 0.5)
    assert out[3] == (1, 1.0)


def test_web_curation_example_compiles_and_runs(spark):
    """examples/web_curation.toml: the URL-stage chain (crawl_dedup ->
    domain_cap -> soft_dedup) compiles from the shipped file and runs
    end-to-end over a synthetic crawl (the file's parquet path is a
    stand-in; the crawl source is overridden here)."""
    from pyspark.sql import functions as F

    from vector_spark.plans.topology import compile_config

    base = "the quick brown fox jumps over the lazy dog again today"
    crawl = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, "HTTPS://H").otherwise("https://h"),
            (F.col("id") % 4).cast("string"),
            F.lit(".com/p/"),
            (F.col("id") % 10).cast("string"),
            F.when(F.col("id") % 2 == 0, ":443/?utm_source=x").otherwise(""),
        ).alias("url"),
        (F.lit(100) + F.col("id")).alias("fetch_ts"),
        F.concat(F.lit(base + " v"), (F.col("id") % 3).cast("string"))
        .alias("text"),
    )
    topo = compile_config(
        spark, "/root/repo/examples/web_curation.toml",
        overrides={"crawl": crawl},
    )
    out = topo.resolve("weighted").collect()
    # 4 hosts x 10 paths -> at most 40 canonical pages; the messy/clean
    # spellings of the same (host, path) collapse to one row each
    canon = {r.canon_url for r in out}
    assert len(out) == len(canon) == 20
    assert all(r.dup_weight > 0 for r in out)
