"""BPE tokenizer (dataprep/bpe.py): train parity vs a naive reference
implementation, encode/decode round-trip, dim-level apply."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.dataprep import bpe


def _naive_bpe(word_counts, num_merges):
    """Independent oracle: full pair recount every iteration (Sennrich
    et al. 2016 fig. 1 pseudocode), same (count DESC, pair ASC) ties."""
    words = {
        tuple(w[:-1]) + (w[-1] + bpe.END,): n for w, n in word_counts
    }
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        new_words = {}
        for syms, n in words.items():
            out, j = [], 0
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and (syms[j], syms[j + 1]) == best
                ):
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("low-key", 1), ("news", 4),
]


def test_train_matches_naive_reference():
    got = bpe.bpe_train(CORPUS, num_merges=20)
    want = _naive_bpe(CORPUS, 20)
    assert got == want
    assert got[0] == ("e", "w")  # newest(6)+news(4)+lower(2): 12 'ew' pairs


def test_train_deterministic_under_input_order():
    a = bpe.bpe_train(CORPUS, num_merges=15)
    b = bpe.bpe_train(list(reversed(CORPUS)), num_merges=15)
    assert a == b


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "the new low"), (2, "newest of the news"), (3, "wide and low")],
        "doc_id long, text string",
    )
    wc = bpe.word_counts(df)
    merges = bpe.bpe_train(wc, num_merges=30)
    vocab = bpe.bpe_vocab(merges, bpe.corpus_alphabet(wc))
    enc = bpe.bpe_encode(df, merges, vocab)
    out = enc.withColumn(
        "rt", bpe.bpe_decode(F.col("tokens"), vocab)
    ).collect()
    texts = {1: "the new low", 2: "newest of the news", 3: "wide and low"}
    assert len(out) == 3
    for r in out:
        assert r.rt == texts[r.doc_id]
        assert r.n_tok == len(r.tokens) > 0


def test_encode_compresses_frequent_words(spark):
    rows = [(i, "stack overflow stack overflow stack") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = bpe.word_counts(df)
    merges = bpe.bpe_train(wc, num_merges=50)
    vocab = bpe.bpe_vocab(merges, bpe.corpus_alphabet(wc))
    (r,) = bpe.bpe_encode(df.limit(1), merges, vocab).collect()
    # fully-merged frequent words → one token per word
    assert r.n_tok == 5


def test_word_counts_top_v_cap(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    got = {r.word: r.n for r in bpe.word_counts(df, top_v=2).collect()}
    assert got == {"a": 3, "b": 2}


def test_word_counts_capped_by_default():
    # bpe_train collects the (word, n) dim to the driver, so the default
    # signature must carry a cap; top_v=None is an explicit opt-out only.
    import inspect

    default = inspect.signature(bpe.word_counts).parameters["top_v"].default
    assert default is not None and default == 50_000


def test_bpe_train_on_capped_dim_deterministic(spark):
    rows = [(i, f"alpha beta gamma token{i % 7} alpha") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = bpe.bpe_train(bpe.word_counts(df, top_v=6), num_merges=20)
    m2 = bpe.bpe_train(bpe.word_counts(df, top_v=6), num_merges=20)
    assert m1 == m2 and len(m1) > 0
