"""End-to-end pipeline tests: routed-row token-array equality + per-sink
aggregate counts vs an independent pandas oracle (FIXTURES.md F4)."""

from __future__ import annotations

import pandas as pd
import pytest

from vector_spark import pipeline, tables
from tests.oracle import oracle_sequences, oracle_pipeline


def test_sequences_shape(seq):
    rows = seq.limit(5).collect()
    assert [r.doc_id for r in rows][:2] == ["doc-000000000000", "doc-000000000001"]
    r0 = rows[0]
    assert r0.n_tok == 16 and len(r0.tokens) == 16
    assert rows[1].tokens[0] == 1_000_003 % 50257
    # row 3: tokens[2] = (3*1000003 + 2*7919) % 50257
    assert rows[3].tokens[2] == (3 * 1_000_003 + 2 * 7919) % 50257


def test_sequences_matches_pandas_oracle(seq):
    got = seq.orderBy("_i").limit(200).toPandas()
    want = oracle_sequences(200)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_tok) == list(want.n_tok)
    assert list(got.source) == list(want.source)
    for g, w in zip(got.tokens, want.tokens):
        assert list(g) == list(w)


def test_source_skew(seq):
    counts = dict(
        (r["source"], r["count"]) for r in seq.groupBy("source").count().collect()
    )
    assert counts["app"] / sum(counts.values()) == pytest.approx(0.45, abs=0.05)


def test_pipeline_routed_token_equality(spark, seq, dim):
    out = pipeline.run_pipeline(seq, dim)
    got = (
        out["routed"]
        .selectExpr("route", "doc_id", "array_join(tokens, ',') AS toks")
        .orderBy("route", "doc_id")
        .toPandas()
    )
    want = oracle_pipeline(1000)["routed"]
    want_df = (
        want[["route", "doc_id", "toks"]]
        .sort_values(["route", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want_df)


def test_pipeline_aggregate_counts(spark, seq, dim):
    out = pipeline.run_pipeline(seq, dim)
    got = (
        out["agg"]
        .selectExpr(
            "route", "source", "team",
            "cast(window_start as string) AS ws",
            "events", "tokens_total",
        )
        .orderBy("route", "source", "ws")
        .toPandas()
    )
    want = oracle_pipeline(1000)["agg"]
    want = want.sort_values(["route", "source", "ws"]).reset_index(drop=True)
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["route", "source", "team", "ws", "events", "tokens_total"]],
        want[["route", "source", "team", "ws", "events", "tokens_total"]],
        check_dtype=False,
    )


def test_route_non_exclusive_copies(spark, seq, dim):
    # a 5xx tier-1 row must appear in BOTH errors and alerts
    out = pipeline.run_pipeline(seq, dim)
    routed = out["routed"]
    doc = (
        routed.filter("route = 'alerts'").select("doc_id").limit(1).collect()
    )
    assert doc, "expected at least one alert row at n=1000"
    doc_id = doc[0].doc_id
    routes = {
        r.route
        for r in routed.filter(routed.doc_id == doc_id).select("route").collect()
    }
    assert {"errors", "alerts"} <= routes


def test_arrow_parse_matches_jvm_parse(spark, seq):
    jvm = pipeline.parse_stage(seq).select(
        "doc_id", "host", "user", "path", "status", "bytes"
    )
    arrow = pipeline.parse_stage_arrow(seq).select(
        "doc_id", "host", "user", "path", "status", "bytes"
    )
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0
