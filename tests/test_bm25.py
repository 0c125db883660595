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
