"""Token-vocabulary stats (dataprep/tokens.py). The corpus paths are
driver-gated bit-exact (seq_token_topk / seq_vocab_oov); here we pin the
semantics on a hand-checkable fixture and the scale-plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.dataprep import tokens as tk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("a", [1, 1, 2, 3], 4),
        ("b", [2, 2, 2, 9], 4),
        ("c", [1, 9, 9, 9, 9], 5),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    ).cache()


def test_token_topk_counts_and_tiebreak(spark, docs):
    got = [(r.token, r.n) for r in tk.token_topk(docs, k=3).collect()]
    # 9 x5, 2 x4, 1 x3 — then ties would break to lower token id
    assert got == [(9, 5), (2, 4), (1, 3)]


def test_vocab_oov_counts_occurrences_not_distinct(spark, docs):
    vocab = spark.createDataFrame([(1,), (2,)], "token int")
    got = {
        r.doc_id: (r.n_oov, r.oov_rate)
        for r in tk.vocab_oov(docs, vocab).collect()
    }
    assert got["a"] == (1, 0.25)      # the single 3
    assert got["b"] == (1, 0.25)      # the single 9
    assert got["c"] == (4, 0.8)       # four 9s — occurrences, not distinct


def test_fully_in_vocab_docs_survive(spark, docs):
    vocab = spark.createDataFrame([(1,), (2,), (3,), (9,)], "token int")
    got = {r.doc_id: r.n_oov for r in tk.vocab_oov(docs, vocab).collect()}
    assert got == {"a": 0, "b": 0, "c": 0}


def test_corpus_vocab_is_topk_cut(spark, docs):
    v = sorted(r.token for r in tk.corpus_vocab(docs, 2).collect())
    assert v == [2, 9]


def test_plan_shapes(spark, docs):
    topk_plan = tk.token_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in topk_plan, (
        "top-k must plan as distributed TakeOrdered, not a global sort"
    )
    vocab = spark.createDataFrame([(1,)], "token int")
    oov_plan = tk.vocab_oov(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in oov_plan and "LeftAnti" in oov_plan, (
        "OOV detection must be a broadcast anti join on the exploded stream"
    )
