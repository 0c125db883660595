"""IVF ANN search + winnowing fingerprints.

The sampled-centroid IVF path is driver-gated bit-exact (emb_ivf_topk /
emb_ivf_recall); here we verify the pieces against NumPy oracles — in
particular :func:`ivf.kmeans_refine`, whose float-mean summation order is
engine-specific and therefore deliberately NOT in the DuckDB gate.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_spark.dataprep import ivf
from vector_spark.dataprep import text as tx


@pytest.fixture(scope="module")
def corpus(spark):
    """200 deterministic 16-dim vectors (LCG, no RNG state)."""
    df = spark.range(200).select(
        F.col("id").cast("int").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: (
                F.sin(F.col("id") * 37 + d * 11).cast("double")
            ),
        ).alias("embedding"),
    )
    return df.cache()


def _np_corpus():
    ids = np.arange(200)
    d = np.arange(16)
    return np.sin(ids[:, None] * 37 + d[None, :] * 11)


def test_assign_cells_matches_numpy(spark, corpus):
    cents = ivf.sampled_centroids(corpus, 8)
    got = {
        r.vec_id: r.cell
        for r in ivf.assign_cells(corpus, cents).select("vec_id", "cell").collect()
    }
    v = _np_corpus()
    c = np.asarray(cents)
    dots = v @ c.T
    want = dots.argmax(axis=1)  # first max ties == array_position first
    assert got == {i: int(want[i]) for i in range(200)}


def test_ivf_topk_subset_of_probed_cells(spark, corpus):
    cents = ivf.sampled_centroids(corpus, 8)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf.ivf_topk(corpus, queries, n_cells=8, nprobe=2, k=4).collect()
    assert len(out) == 12  # 3 queries × k
    probed = {
        (r.query_id, r.cell)
        for r in ivf.probe_cells(
            queries.select("query_id", F.col("embedding").alias("__qv")),
            cents, 2, vec_col="__qv",
        ).collect()
    }
    cells = {
        r.vec_id: r.cell
        for r in ivf.assign_cells(corpus, cents).select("vec_id", "cell").collect()
    }
    for r in out:
        assert (r.query_id, cells[r.vec_id]) in probed
    # top-1 for a corpus-member query is itself
    for r in out:
        if r.rank == 1:
            assert r.vec_id == r.query_id and r.cosine == 1.0


def test_ivf_recall_gate(spark, corpus):
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    row = ivf.ivf_recall_summary(
        corpus, queries, n_cells=8, nprobe=4, k=3, min_recall=0.5
    ).collect()[0]
    assert row.n_exact == 15
    assert row.meets_bound


def test_kmeans_refine_matches_numpy(spark, corpus):
    seeds = ivf.sampled_centroids(corpus, 4)
    got = np.asarray(ivf.kmeans_refine(corpus, seeds, iters=2))

    v = _np_corpus()
    c = np.asarray(seeds)
    for _ in range(2):
        assign = (v @ c.T).argmax(axis=1)
        nxt = c.copy()
        for cell in range(4):
            members = v[assign == cell]
            if len(members):
                nxt[cell] = members.mean(axis=0)
        c = nxt
    assert got.shape == c.shape
    np.testing.assert_allclose(got, c, rtol=1e-9)


# ---- winnowing ------------------------------------------------------------


def _winnow_df(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return (
        df.withColumn("__norm", tx.normalize(F.col("text")))
        .withColumn("__h", tx.char_gram_hashes(F.col("__norm"), k=8))
        .withColumn("fp", tx.winnow(F.col("__h"), w=4))
    )


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: a shared substring of length ≥ k + w - 1
    (= 11 chars) yields at least one common fingerprint."""
    shared = "the quick brown fox jumps over the lazy dog"
    out = {
        r.doc_id: set(r.fp)
        for r in _winnow_df(
            spark,
            [
                ("a", f"PREFIX ONE {shared} SUFFIX ALPHA"),
                ("b", f"other beginning {shared} different end"),
                ("c", "completely unrelated content with no overlap at all"),
            ],
        ).collect()
    }
    assert out["a"] & out["b"], "shared substring must share a fingerprint"
    assert not (out["a"] & out["c"] & out["b"])


def test_winnow_short_text_keeps_all_hashes(spark):
    rows = [("s", "ab")]  # shorter than k → single whole-string hash
    out = _winnow_df(spark, rows).select(F.size("fp").alias("n")).collect()
    assert out[0].n == 1


def test_winnow_fingerprints_subset_of_hashes(spark):
    out = _winnow_df(
        spark, [("d", "some moderately long document text for winnowing")]
    ).select("__h", "fp").collect()[0]
    assert set(out.fp) <= set(out["__h"])
    assert sorted(out.fp) == list(out.fp)  # sorted, distinct
    assert len(out.fp) < len(out["__h"])  # winnowing actually compresses


def test_winnow_pandas_strategy_bit_exact(spark):
    """The vectorized-numpy strategy must produce byte-identical
    fingerprint arrays to the column-expression chain, including the
    short-text (< k), exactly-k, < w-window, unicode, and empty tails."""
    rows = [
        ("empty", ""),
        ("short", "ab"),
        ("exact_k", "abcdefgh"),  # exactly k=8 chars → one hash
        ("k_plus", "abcdefghij"),  # 3 hashes < w=4 → keep all
        ("longer", "some moderately long document text for winnowing"),
        ("uni", "héllo wörld — ünïcode text for çode-point parity"),
        ("rep", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string").withColumn(
        "__norm", tx.normalize(F.col("text"))
    )
    for k, w in [(8, 4), (16, 8), (5, 2)]:
        expr = {
            r.doc_id: r.fp
            for r in df.withColumn(
                "fp", tx.winnow_fingerprints(F.col("__norm"), k=k, w=w,
                                             strategy="expr")
            ).collect()
        }
        fast = {
            r.doc_id: r.fp
            for r in df.withColumn(
                "fp", tx.winnow_fingerprints(F.col("__norm"), k=k, w=w,
                                             strategy="pandas")
            ).collect()
        }
        assert expr == fast, f"strategy divergence at k={k}, w={w}"


def test_winnow_near_dups_planted(spark):
    from vector_spark.dataprep.dedup import winnow_near_dups

    shared = "a long enough shared passage that winnowing must fingerprint identically" * 2
    rows = [("d1", f"unique opening one {shared} ending alpha"),
            ("d2", f"different preamble {shared} other tail"),
            ("d3", "totally different text with nothing in common here at all, " * 4)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = winnow_near_dups(df, min_shared=3, fp_cap=3).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [("d1", "d2")]
    assert pairs[0].shared >= 3


def test_semantic_dedup_keep_first(spark):
    """Planted near-identical vectors drop; the SMALLER id survives."""
    import numpy as np

    from vector_spark.dataprep.ivf import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # ids 100+i duplicate i (tiny perturbation, cosine ≈ 1)
    rows += [
        (100 + i, [float(x) for x in base[i] * 1.001]) for i in range(0, 40, 4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r.vec_id for r in semantic_dedup(df, n_cells=4, threshold=0.99).collect()}
    assert set(range(40)) <= kept          # originals all kept
    assert not kept & {100 + i for i in range(0, 40, 4)}  # copies dropped


def test_semantic_dedup_no_dups_keeps_all(spark):
    import numpy as np

    from vector_spark.dataprep.ivf import semantic_dedup

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert semantic_dedup(df, n_cells=4, threshold=0.999).count() == 30
