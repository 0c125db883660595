"""BM25 scoring (dataprep/bm25.py) vs an independent naive implementation."""

from __future__ import annotations

import math

import pytest

from vector_spark.dataprep.bm25 import bm25_scores

DOCS = [
    (0, "spark join hash join window"),
    (1, "hash table scan scan scan"),
    (2, "window order by window"),
    (3, "nothing relevant here"),
]
TERMS = ["join", "window", "hash"]
K1, B = 1.2, 0.75


def _naive():
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {
        t: sum(1 for w in toks.values() if t in w) for t in TERMS
    }
    out = {}
    for i, w in toks.items():
        score, hit = 0.0, 0
        for t in TERMS:
            tf = w.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * len(w) / avgdl)
            )
        if hit:
            out[i] = (hit, score)
    return out


def test_bm25_matches_naive(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_terms, r.bm25)
        for r in bm25_scores(docs, TERMS, k1=K1, b=B).collect()
    }
    want = _naive()
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)


def test_bm25_requires_terms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


# --- hybrid RRF fusion -------------------------------------------------------


def test_rrf_fuse_math_and_missing_legs(spark):
    from vector_spark.dataprep.retrieval import rrf_fuse

    sparse = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, rank long"
    )
    got = {r.doc_id: r for r in rrf_fuse(sparse, dense, k=10, c=60).collect()}
    # doc 11 in both legs wins; 10/12 one-leg docs contribute a single term
    assert got[11].fused_rank == 1
    assert abs(got[11].rrf - (1 / 62 + 1 / 61)) < 1e-6
    assert got[10].rank_dense is None and abs(got[10].rrf - 1 / 61) < 1e-6
    assert got[12].rank_sparse is None and abs(got[12].rrf - 1 / 62) < 1e-6
    # deterministic tie-break: 10 (1/61) beats 12 (1/62)
    assert got[10].fused_rank == 2 and got[12].fused_rank == 3


def test_bm25_ranked_is_take_ordered(spark):
    from vector_spark.dataprep.retrieval import bm25_ranked

    docs_df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = bm25_ranked(docs_df, ["spark", "hash"], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, (
        "top-k cut must be distributed TakeOrdered, not a global sort"
    )
    rows = out.collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, len(rows) + 1)
    )
