"""LM perplexity filter + DSIR importance weights vs pure-Python oracles."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from pyspark.sql import functions as F

from vector_spark.dataprep import lm

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "zzz qqq xxx unseen words entirely"),
    (3, "the the the the the"),
    (4, "a cat and a dog and a mat"),
    (5, ""),
]
REF_IDS = {0, 1, 4}  # "trusted" reference subset


def _norm_words(s: str) -> list[str]:
    # mirrors text.words(): lowercase, collapse whitespace, split on " "
    # ("" yields [""] in both engines)
    return " ".join(s.lower().split()).split(" ")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _hash60(s: str) -> int:
    return int(_md5(s)[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(4)


def _py_lm(vocab_size: int) -> tuple[dict[str, int], int, int]:
    c = Counter()
    for i, t in DOCS:
        if i in REF_IDS:
            c.update(_norm_words(t))
    top = sorted(c.items(), key=lambda kv: (-kv[1], _md5(kv[0])))[:vocab_size]
    lm_d = dict(top)
    return lm_d, sum(lm_d.values()), len(lm_d)


def test_unigram_lm_counts_and_cap(spark, docs):
    ref = docs.filter(F.col("doc_id").isin(list(REF_IDS)))
    got = {r["word"]: r["c"] for r in lm.unigram_lm(ref, vocab_size=100).collect()}
    exp, _, _ = _py_lm(100)
    assert got == exp

    # deterministic cap: md5 tie-break, independent of partitioning
    got3 = lm.unigram_lm(ref.repartition(7), vocab_size=3).collect()
    exp3, _, _ = _py_lm(3)
    assert {r["word"]: r["c"] for r in got3} == exp3


def test_doc_cross_entropy_matches_python(spark, docs):
    ref = docs.filter(F.col("doc_id").isin(list(REF_IDS)))
    lmdf = lm.unigram_lm(ref, vocab_size=100)
    got = {
        r["doc_id"]: (r["n_words"], r["ce_micro"], r["ppl"])
        for r in lm.doc_cross_entropy(docs, lmdf).collect()
    }
    lm_d, N, V = _py_lm(100)
    k = 0.5
    for i, t in DOCS:
        ws = _norm_words(t)
        micros = [
            round(-math.log2((lm_d.get(w, 0) + k) / (N + k * (V + 1))) * 1e6)
            for w in ws
        ]
        ce = sum(micros)
        ppl = round(2 ** (ce / (len(ws) * 1e6)), 4)
        assert got[i] == (len(ws), ce, ppl), f"doc {i}"
    # trusted docs score lower than the unseen-words doc
    assert got[0][2] < got[2][2] and got[1][2] < got[2][2]


def test_ppl_bucket(spark, docs):
    ref = docs.filter(F.col("doc_id").isin(list(REF_IDS)))
    lmdf = lm.unigram_lm(ref, vocab_size=100)
    scored = lm.doc_cross_entropy(docs, lmdf).withColumn(
        "bucket", lm.ppl_bucket(F.col("ppl"), head=15.0, tail=40.0)
    )
    rows = {r["doc_id"]: r["bucket"] for r in scored.collect()}
    assert set(rows.values()) <= {"head", "middle", "tail"}
    assert rows[2] == "tail"  # all-OOV doc


def _py_grams(t: str, ns=(1, 2)) -> list[str]:
    ws = _norm_words(t)
    out: list[str] = []
    for n in ns:
        if n == 1:
            out += ws
        elif len(ws) >= n:
            out += [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    return out


def test_dsir_weights_match_python(spark, docs):
    B, k = 64, 0.5
    target = docs.filter(F.col("doc_id").isin([0, 1]))
    got = {
        r["doc_id"]: (r["n_grams"], r["imp_micro"], r["imp"])
        for r in lm.dsir_weights(docs, target, buckets=B).collect()
    }

    qc: Counter = Counter()
    pc: Counter = Counter()
    for i, t in DOCS:
        bs = [_hash60(g) % B for g in _py_grams(t)]
        qc.update(bs)
        if i in (0, 1):
            pc.update(bs)
    Nq, Np = sum(qc.values()), sum(pc.values())
    lam = {
        b: round(
            (
                math.log2((pc.get(b, 0) + k) / (Np + k * B))
                - math.log2((qc[b] + k) / (Nq + k * B))
            )
            * 1e6
        )
        for b in qc
    }
    for i, t in DOCS:
        bs = [_hash60(g) % B for g in _py_grams(t)]
        micro = sum(lam[b] for b in bs)
        imp = round(micro / (len(bs) * 1e6), 4)
        assert got[i] == (len(bs), micro, imp), f"doc {i}"
    # target-like docs outweigh the OOV doc
    assert got[0][2] > got[2][2] and got[1][2] > got[2][2]


def test_dsir_partition_invariance(spark, docs):
    target = docs.filter(F.col("doc_id") % 2 == 0)
    a = lm.dsir_weights(docs.repartition(1), target, buckets=32).collect()
    b = lm.dsir_weights(docs.repartition(9), target, buckets=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bigram_cross_entropy_matches_python(spark, docs):
    ref = docs.filter(F.col("doc_id").isin(list(REF_IDS)))
    uni = lm.unigram_lm(ref, vocab_size=100)
    bi = lm.bigram_lm(ref, bigram_size=100)
    got = {
        r["doc_id"]: (r["n_words"], r["ce_micro"], r["ppl"])
        for r in lm.doc_cross_entropy_bigram(docs, uni, bi).collect()
    }

    lm_d, N, V = _py_lm(100)
    bic: Counter = Counter()
    for i, t in DOCS:
        if i in REF_IDS:
            ws = _norm_words(t)
            bic.update(
                " ".join(ws[j : j + 2]) for j in range(len(ws) - 1)
            )
    k, lam = 0.5, 0.7
    for i, t in DOCS:
        ws = _norm_words(t)
        micros = []
        for j, w in enumerate(ws):
            p_uni = (lm_d.get(w, 0) + k) / (N + k * (V + 1))
            if j == 0:
                p = p_uni
            else:
                gram = ws[j - 1] + " " + w
                p_bi = (bic.get(gram, 0) + k) / (
                    lm_d.get(ws[j - 1], 0) + k * (V + 1)
                )
                p = lam * p_bi + (1.0 - lam) * p_uni
            micros.append(round(-math.log2(p) * 1e6))
        ce = sum(micros)
        ppl = round(2 ** (ce / (len(ws) * 1e6)), 4)
        assert got[i] == (len(ws), ce, ppl), f"doc {i}"
    # second-order context separates the repeated-word doc from prose
    assert got[3][2] != got[0][2]


def test_lm_perplexity_topology_type(spark, docs):
    from vector_spark.plans.topology import compile_config

    topo = compile_config(
        spark,
        {
            "transforms": {
                "lmq": {
                    "inputs": ["corpus"],
                    "type": "lm_perplexity",
                    "ref_condition": ".doc_id == 0 || .doc_id == 1 || .doc_id == 4",
                    "vocab_size": 100,
                    "max_ppl": 1e9,
                }
            }
        },
        overrides={"corpus": docs},
    )
    out = topo.resolve("lmq")
    assert "ppl" in out.columns
    assert out.count() == len(DOCS)  # max_ppl generous: all pass, stamped
    # tightening the threshold actually filters
    topo2 = compile_config(
        spark,
        {
            "transforms": {
                "lmq": {
                    "inputs": ["corpus"],
                    "type": "lm_perplexity",
                    "ref_condition": ".doc_id == 0 || .doc_id == 1 || .doc_id == 4",
                    "vocab_size": 100,
                    "max_ppl": 15.0,
                }
            }
        },
        overrides={"corpus": docs},
    )
    kept = {r["doc_id"] for r in topo2.resolve("lmq").collect()}
    assert 2 not in kept  # the all-OOV doc scores worst


def test_token_bigram_ppl_matches_naive(spark):
    """Int-native token bigram LM vs an independent Python replay."""
    import math

    from vector_spark.dataprep.lm import (
        token_bigram_lm,
        token_cross_entropy_bigram,
        token_unigram_lm,
    )

    rows = [("a", [1, 2, 1, 2, 3]), ("b", [2, 3, 2]), ("c", [9])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    uni = token_unigram_lm(df, vocab_size=100)
    bi = token_bigram_lm(df, bigram_size=100)
    got = {r.doc_id: r for r in token_cross_entropy_bigram(df, uni, bi).collect()}

    # naive replay
    toks = {d: t for d, t in rows}
    uc, bc = {}, {}
    for t in toks.values():
        for x in t:
            uc[x] = uc.get(x, 0) + 1
        for p, c in zip(t, t[1:]):
            bc[(p, c)] = bc.get((p, c), 0) + 1
    n, v, k, lam = sum(uc.values()), len(uc), 0.5, 0.7
    for d, t in toks.items():
        ce = 0
        for i, c in enumerate(t):
            p_uni = (uc.get(c, 0) + k) / (n + k * (v + 1))
            if i == 0:
                p = p_uni
            else:
                p_bi = (bc.get((t[i - 1], c), 0) + k) / (
                    uc.get(t[i - 1], 0) + k * (v + 1)
                )
                p = lam * p_bi + (1 - lam) * p_uni
            ce += round(-math.log2(p) * 1e6)
        assert got[d].ce_micro == ce
        assert got[d].n_tok == len(t)
        assert abs(got[d].ppl - 2 ** (ce / (len(t) * 1e6))) < 1e-3


def test_token_bigram_ppl_skips_empty_docs(spark):
    from vector_spark.dataprep.lm import (
        token_bigram_lm,
        token_cross_entropy_bigram,
        token_unigram_lm,
    )

    df = spark.createDataFrame(
        [("a", [1, 2]), ("z", [])], "doc_id string, tokens array<int>"
    )
    uni = token_unigram_lm(df)
    out = token_cross_entropy_bigram(df, uni, token_bigram_lm(df)).collect()
    assert {r.doc_id for r in out} == {"a"}
