"""Token-level exact-substring dedup (dataprep.substring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.dataprep.substring import token_gram_hashes, token_substring_dedup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_first_occurrence_keeps_later_is_cut(spark):
    # doc b repeats doc a's 6-token run verbatim in the middle.
    run = [10, 11, 12, 13, 14, 15]
    a = run + [20, 21]
    b = [30, 31] + run + [40]
    out = {
        r["doc_id"]: r
        for r in token_substring_dedup(
            _mk(spark, [("a", a), ("b", b)]), k=6
        ).collect()
    }
    assert out["a"]["n_cut"] == 0 and out["a"]["n_kept"] == 8
    # b loses exactly the 6 repeated tokens; flanks survive
    assert out["b"]["n_dup_grams"] == 1
    assert out["b"]["n_cut"] == 6
    assert out["b"]["n_kept"] == 3


def test_overlapping_spans_merge_into_one_island(spark):
    # doc b repeats a 7-token run: two overlapping 6-grams -> one island of 7.
    run = list(range(100, 107))
    out = {
        r["doc_id"]: r
        for r in token_substring_dedup(
            _mk(spark, [("a", run + [1]), ("b", [2] + run + [3])]), k=6
        ).collect()
    }
    assert out["b"]["n_dup_grams"] == 2
    assert out["b"]["n_cut"] == 7
    assert out["b"]["n_kept"] == 2


def test_short_docs_pass_through(spark):
    out = token_substring_dedup(
        _mk(spark, [("a", [1, 2, 3]), ("b", [1, 2, 3])]), k=6
    ).collect()
    assert all(r["n_grams"] == 0 and r["n_cut"] == 0 for r in out)
    # identical short docs keep identical digests (no dedup below k)
    assert len({r["kept_digest"] for r in out}) == 1


def test_self_repetition_within_one_doc(spark):
    run = [7, 8, 9, 10, 11, 12]
    doc = run + [50] + run  # second occurrence inside the SAME doc
    (r,) = token_substring_dedup(_mk(spark, [("a", doc)]), k=6).collect()
    assert r["n_dup_grams"] == 1 and r["n_cut"] == 6 and r["n_kept"] == 7


def test_fully_cut_doc_has_null_digest(spark):
    run = list(range(200, 206))
    out = {
        r["doc_id"]: r
        for r in token_substring_dedup(
            _mk(spark, [("a", run), ("b", run)]), k=6
        ).collect()
    }
    assert out["b"]["n_kept"] == 0 and out["b"]["kept_digest"] is None
    assert out["a"]["kept_digest"] is not None


def test_gram_hashes_match_naive_chain(spark):
    toks = [5, 50_000, 3, 17, 9]
    k = 3
    rows = (
        spark.createDataFrame([("a", toks)], "doc_id string, tokens array<int>")
        .select(F.explode(token_gram_hashes(F.col("tokens"), k)).alias("h"))
        .collect()
    )

    def chain(sub, base, mod):
        h = sub[0]
        for t in sub[1:]:
            h = (h * base + t) % mod
        return h

    for i, r in enumerate(rows):
        sub = toks[i : i + k]
        assert r["h"]["h1"] == chain(sub, 257, 1_000_000_000_000_037)
        assert r["h"]["h2"] == chain(sub, 263, 999_999_999_999_989)
