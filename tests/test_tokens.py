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


# --- length buckets / strided chunks / unigram stats / accounting -----------


def test_pow2_bucket_exact_powers_and_edges(spark):
    df = spark.range(1).select(
        *[tk.pow2_bucket(F.lit(n)).alias(f"b{n}") for n in (1, 2, 3, 4, 5, 127, 128, 129, 256)]
    )
    row = df.collect()[0]
    assert [row[f"b{n}"] for n in (1, 2, 3, 4, 5, 127, 128, 129, 256)] == [
        1, 2, 4, 4, 8, 128, 128, 256, 256
    ]


def test_length_histogram(spark, docs):
    got = {r.bucket_len: (r.n_docs, r.tokens_total, r.pad_waste) for r in tk.length_histogram(docs).collect()}
    # a,b: n=4 → bucket 4 (no waste); c: n=5 → bucket 8, waste 3
    assert got == {4: (2, 8, 0), 8: (1, 5, 3)}


def test_strided_chunks_protocol(spark):
    # one 10-token doc, width 4 stride 2: chunks at 0,2,4,6 — stop once
    # the previous window reached the end (start 8 would be all-overlap)
    df = spark.createDataFrame(
        [("d", list(range(10, 20)), 10)], "doc_id string, tokens array<int>, n_tok int"
    )
    out = sorted(
        (r.chunk_idx, r.start, r.tokens, r.n_ctx, r.n_new)
        for r in tk.strided_chunks(df, width=4, stride=2).collect()
    )
    assert out == [
        (0, 0, [10, 11, 12, 13], 4, 4),
        (1, 2, [12, 13, 14, 15], 4, 2),
        (2, 4, [14, 15, 16, 17], 4, 2),
        (3, 6, [16, 17, 18, 19], 4, 2),
    ]
    # coverage: n_new sums to the doc length
    assert sum(r[-1] for r in out) == 10


def test_strided_chunks_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [("s", [7, 8], 2), ("z", [], 0)], "doc_id string, tokens array<int>, n_tok int"
    )
    out = tk.strided_chunks(df, width=4, stride=2).collect()
    assert len(out) == 1 and out[0].doc_id == "s"
    assert (out[0].n_ctx, out[0].n_new, out[0].tokens) == (2, 2, [7, 8])


def test_unigram_stats_hand_checked(spark, docs):
    import math

    got = {r.doc_id: r for r in tk.unigram_stats(docs).collect()}
    # c = [1,9,9,9,9]: counts {1:1, 9:4}; H = -(1/5)log2(1/5)-(4/5)log2(4/5)
    h = -(1 / 5) * math.log2(1 / 5) - (4 / 5) * math.log2(4 / 5)
    assert got["c"].n_unique == 2
    assert got["c"].top_share == 0.8
    assert abs(got["c"].entropy_bits - h) < 1e-4
    assert got["a"].n_unique == 3 and got["a"].unique_ratio == 0.75


def test_token_accounting_shares(spark):
    from vector_spark.dataprep.mixing import token_accounting

    df = spark.createDataFrame(
        [("w", "s1", 6), ("x", "s1", 4), ("y", "s2", 10)],
        "doc_id string, source string, n_tok int",
    )
    got = {r.source: r for r in token_accounting(df).collect()}
    assert got["s1"].n_docs == 2 and got["s1"].n_tokens == 10
    assert got["s1"].mean_len == 5.0 and got["s1"].share == 0.5
    assert got["s2"].share == 0.5


def test_pack_token_segments_matches_pack_tokens(spark):
    """seg_lens must partition every packed chunk: same chunk ids, and
    sum(seg_lens) == n_fill of the materialized packer."""
    from vector_spark.dataprep.packing import pack_token_segments, pack_tokens

    rows = [(i, list(range(i * 100, i * 100 + 5 + (i * 7) % 11)), 5 + (i * 7) % 11) for i in range(40)]
    df = spark.createDataFrame(rows, "_i long, tokens array<int>, n_tok int")
    segs = {r.chunk_id: (r.seg_lens, r.n_fill) for r in pack_token_segments(df, seq_len=16, order_col="_i").collect()}
    packed = {r.chunk_id: r.n_fill for r in pack_tokens(df, seq_len=16, order_col="_i").collect()}
    assert segs.keys() == packed.keys()
    for cid, (lens, nf) in segs.items():
        assert sum(lens) == nf == packed[cid]
        assert all(l > 0 for l in lens)
    # boundaries reproduce the concatenation: doc lengths reassemble
    total = sum(nf for _, nf in segs.values())
    assert total == sum(r[2] for r in rows)


def test_group_sample_exact_k_and_determinism(spark):
    from vector_spark.dataprep.mixing import group_sample

    rows = [(f"d{i:04d}", "big" if i < 400 else "small", 10) for i in range(450)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = group_sample(df, k=20, margin=4)
    got = {r.source: [] for r in out.collect()}
    for r in out.collect():
        got[r.source].append((r.sample_rank, r.doc_id))
    # exact k from the big group, whole-group path caps at k for small too
    assert len(got["big"]) == 20 and len(got["small"]) == 20
    # determinism: re-running yields the identical membership and ranks
    again = {(r.source, r.sample_rank, r.doc_id) for r in group_sample(df, k=20, margin=4).collect()}
    assert again == {(s, rk, d) for s, v in got.items() for rk, d in v}
    # ranks are 1..k without gaps
    assert sorted(rk for rk, _ in got["big"]) == list(range(1, 21))


def test_group_sample_matches_true_k_smallest(spark):
    """Two-phase cutoff must reproduce the true k-smallest-hash set."""
    from vector_spark.dataprep.dedup import shingle_hash64
    from vector_spark.dataprep.mixing import group_sample

    rows = [(f"d{i:04d}", "g", 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    naive = [
        r.doc_id
        for r in df.select(
            "doc_id",
            shingle_hash64(F.concat(F.lit("gsample~"), F.col("doc_id"))).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(25)
        .collect()
    ]
    got = sorted(
        (r.sample_rank, r.doc_id) for r in group_sample(df, k=25).collect()
    )
    assert [d for _, d in got] == naive


def test_curriculum_order_is_bucket_then_hash(spark):
    from vector_spark.dataprep.dedup import shingle_hash64
    from vector_spark.dataprep.mixing import curriculum_order

    rows = [(f"d{i:03d}", (i % 3) + 1, 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, bucket int, n_tok int")
    out = curriculum_order(df, "bucket", epoch=2)
    flat = (
        df.select(
            "doc_id",
            "bucket",
            shingle_hash64(F.concat(F.lit("cur2~"), F.col("doc_id"))).alias("h"),
        )
        .orderBy("bucket", "h", "doc_id")
        .collect()
    )
    expect = {r.doc_id: i for i, r in enumerate(flat)}
    got = {r.doc_id: r.position for r in out.collect()}
    assert got == expect
    # different epoch ⇒ different within-bucket permutation
    other = {r.doc_id: r.position for r in curriculum_order(df, "bucket", epoch=3).collect()}
    assert other != got


def test_shard_assign_balance_and_order(spark):
    from vector_spark.dataprep.mixing import shard_assign

    df = spark.createDataFrame([(i,) for i in range(103)], "position long")
    out = shard_assign(df, 8).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.position)
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] - sizes[0] <= 1  # balanced ±1
    # round-robin interleave preserves global order when read round-robin
    for s, ps in by_shard.items():
        assert all(p % 8 == s for p in ps)


def test_source_kl_hand_checked(spark):
    import math

    # s1 skews to token 1, s2 is the complement; corpus is their mix
    rows = [
        ("a", "s1", [1, 1, 1, 2]),
        ("b", "s2", [2, 2, 1, 2]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, tokens array<int>")
    got = {r.source: r for r in tk.source_kl(df).collect()}

    def kl(p, q):
        return sum(pi * math.log(pi / qi) for pi, qi in zip(p, q) if pi > 0)

    # corpus: token1 4/8, token2 4/8; s1: (3/4, 1/4); s2: (1/4, 3/4)
    want = kl([3 / 4, 1 / 4], [1 / 2, 1 / 2])
    assert got["s1"].n_tokens == 4 and got["s2"].n_tokens == 4
    assert abs(got["s1"].kl_nats - want) < 1e-4
    assert abs(got["s2"].kl_nats - want) < 1e-4  # symmetric construction


def test_source_kl_zero_for_identical_distributions(spark):
    rows = [("a", "x", [1, 2, 3]), ("b", "y", [1, 2, 3])]
    df = spark.createDataFrame(rows, "doc_id string, source string, tokens array<int>")
    for r in tk.source_kl(df).collect():
        assert r.kl_nats == 0.0


def test_vocab_coverage_hand_checked(spark, docs):
    # corpus occurrences: 9 x5, 2 x4, 1 x3, 3 x1 → total 13
    got = {r.cutoff: r for r in tk.vocab_coverage(docs, cutoffs=[1, 2, 10]).collect()}
    assert got[1].covered == 5 and got[1].total == 13
    assert got[2].covered == 9
    assert got[10].covered == 13 and got[10].coverage == 1.0
    assert abs(got[1].coverage - 5 / 13) < 1e-6


def test_self_repetition_hand_checked(spark):
    # doc a: [1,2,1,2,1,2] with n=2 → grams (1,2),(2,1),(1,2),(2,1),(1,2):
    # all 5 occurrences repeated. doc b: strictly increasing → none.
    rows = [("a", [1, 2, 1, 2, 1, 2]), ("b", [1, 2, 3, 4, 5, 6])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r.doc_id: r for r in tk.self_repetition(df, n=2).collect()}
    assert got["a"].ngrams_total == 5 and got["a"].ngrams_rep == 5
    assert got["a"].rep_frac == 1.0
    assert got["b"].ngrams_rep == 0 and got["b"].rep_frac == 0.0


def test_bucket_batches_structure(spark):
    from vector_spark.dataprep.mixing import bucket_batches

    rows = [(f"d{i:03d}", (i % 2) + 1) for i in range(70)]  # 2 buckets, 35 each
    df = spark.createDataFrame(rows, "doc_id string, bucket int")
    out = bucket_batches(df, "bucket", batch_size=8, epoch=3).collect()
    by = {}
    for r in out:
        by.setdefault((r.bucket, r.batch_id), []).append(r.batch_pos)
    for (b, bid), poss in by.items():
        # full batches are exactly 0..7; only the LAST batch per bucket is partial
        n_batches = max(i for (bb, i) in by if bb == b) + 1
        if bid < n_batches - 1:
            assert sorted(poss) == list(range(8))
        else:
            assert sorted(poss) == list(range(35 - 8 * (n_batches - 1)))
    # determinism
    again = {(r.doc_id, r.batch_id, r.batch_pos)
             for r in bucket_batches(df, "bucket", batch_size=8, epoch=3).collect()}
    assert again == {(r.doc_id, r.batch_id, r.batch_pos) for r in out}
    # a different epoch deals different batches
    other = {(r.doc_id, r.batch_id, r.batch_pos)
             for r in bucket_batches(df, "bucket", batch_size=8, epoch=4).collect()}
    assert other != again


def test_mixture_report_explicit_weights(spark):
    from vector_spark.dataprep.mixing import mixture_report

    df = spark.createDataFrame(
        [("a", "web", 60), ("b", "web", 20), ("c", "code", 20)],
        "doc_id string, source string, n_tok int",
    )
    got = {r.source: r for r in mixture_report(
        df, weights={"web": 0.5, "code": 0.5}
    ).collect()}
    assert got["web"].actual_share == 0.8 and got["web"].target_share == 0.5
    assert got["code"].deviation == 0.3  # under-represented by 30 points
    assert got["code"].resample_factor == 2.5  # 0.5 / 0.2
