"""Product-quantization ANN (dataprep/pq.py).

The sampled-codebook PQ path is driver-gated bit-exact (emb_pq_topk /
emb_pq_recall vs the DuckDB mirror in oracles.pq_*_sql); here we verify
the encode/ADC pieces against a NumPy oracle built from the same
integer micro-unit distance definition.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_spark.dataprep import pq

DIM, N = 16, 120


@pytest.fixture(scope="module")
def corpus(spark):
    """Deterministic 16-dim vectors (sin lattice, no RNG state)."""
    df = spark.range(N).select(
        F.col("id").cast("int").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.sin(F.col("id") * 37 + d * 11).cast("double"),
        ).alias("embedding"),
    )
    return df.cache()


def _np_corpus():
    ids = np.arange(N)
    d = np.arange(DIM)
    return np.sin(ids[:, None] * 37 + d[None, :] * 11)


def _np_codebooks(m, ksub):
    v = _np_corpus()[:ksub]
    dsub = DIM // m
    return [v[:, s * dsub : (s + 1) * dsub] for s in range(m)]


def _np_dists_u(sub, book):
    """Micro-unit squared L2 from one subvector to each codeword."""
    d = (sub * sub).sum() - 2.0 * (book @ sub) + (book * book).sum(axis=1)
    return np.round(d * pq.MICRO).astype(np.int64)


def test_codebooks_are_sampled_slices(spark, corpus):
    books = pq.pq_codebooks(corpus, m=4, ksub=6)
    want = _np_codebooks(4, 6)
    assert len(books) == 4 and len(books[0]) == 6
    for s in range(4):
        np.testing.assert_allclose(np.asarray(books[s]), want[s], rtol=0)


def test_encode_matches_numpy_argmin(spark, corpus):
    m, ksub = 4, 8
    books = pq.pq_codebooks(corpus, m=m, ksub=ksub)
    got = {
        r.vec_id: list(r.codes)
        for r in pq.pq_encode(corpus, books).select("vec_id", "codes").collect()
    }
    v = _np_corpus()
    nb = _np_codebooks(m, ksub)
    dsub = DIM // m
    for i in range(N):
        for s in range(m):
            d = _np_dists_u(v[i, s * dsub : (s + 1) * dsub], nb[s])
            assert got[i][s] == int(d.argmin())  # first-min tie break


def test_adc_score_is_sum_of_table_lookups(spark, corpus):
    m, ksub, k = 4, 8, 3
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq.pq_topk(corpus, queries, m=m, ksub=ksub, k=k).collect()
    assert len(out) == 2 * k

    v = _np_corpus()
    nb = _np_codebooks(m, ksub)
    dsub = DIM // m
    codes = np.stack(
        [
            np.stack(
                [
                    _np_dists_u(v[i, s * dsub : (s + 1) * dsub], nb[s]).argmin()
                    for s in range(m)
                ]
            )
            for i in range(N)
        ]
    )
    for r in out:
        tabs = [
            _np_dists_u(v[r.query_id, s * dsub : (s + 1) * dsub], nb[s])
            for s in range(m)
        ]
        want = sum(int(tabs[s][codes[r.vec_id, s]]) for s in range(m))
        assert r.adc_u == want


def test_recall_gate_passes_and_raises(spark, corpus):
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    row = pq.pq_recall_summary(
        corpus, queries, m=4, ksub=16, k=3, shortlist=40, min_recall=0.5
    ).collect()[0]
    assert row.n_exact == 9
    assert row.meets_bound
    with pytest.raises(AssertionError, match="below bound"):
        pq.pq_recall_summary(
            corpus, queries, m=2, ksub=2, k=3, shortlist=3, min_recall=1.01
        )


def test_dim_not_divisible_raises(spark, corpus):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_codebooks(corpus, m=5, ksub=4)
