"""Training-data pipeline ops: dedup, similarity, text, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.dataprep import dedup as dd
from vector_spark.dataprep import multimodal as mm
from vector_spark.dataprep import similarity as sim
from vector_spark.dataprep import text as tx

TD = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TD}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{TD}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text here")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dd.exact_dedup(df).collect())
    assert kept == [1, 3]  # 2 is a normalized dup of 1


def test_incremental_dedup(spark):
    store_src = spark.createDataFrame(
        [(0, "seen before"), (9, "ancient text")], "doc_id long, text string"
    )
    store = store_src.select(tx.fingerprint(F.col("text")).alias("fp"))
    batch = spark.createDataFrame(
        [
            (10, "Seen  Before"),      # dup of history → dropped
            (11, "brand new doc"),     # fresh → kept
            (12, "brand  NEW doc"),    # within-batch dup of 11 → dropped
            (13, "also fresh"),        # fresh → kept
        ],
        "doc_id long, text string",
    )
    kept, new_fps = dd.incremental_dedup(batch, store)
    assert sorted(r.doc_id for r in kept.collect()) == [11, 13]
    fps = {r.fp: r.first_doc_id for r in new_fps.collect()}
    assert len(fps) == 2 and set(fps.values()) == {11, 13}
    # appending new_fps to the store makes a rerun of the same batch empty
    store2 = store.unionByName(new_fps.select("fp"))
    kept2, _ = dd.incremental_dedup(batch, store2)
    assert kept2.count() == 0


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "A  b"), (3, "c")], "doc_id long, text string"
    )
    groups = dd.exact_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0].members == [1, 2]


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words entirely unrelated content about spark engines"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = dd.minhash_near_dups(df, threshold=0.3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    assert all(p in {(1, 2)} for p in found)


def test_token_minhash_finds_planted_near_dup(spark):
    # doc 2 = doc 1 with one token changed at the end; doc 3 disjoint
    base = list(range(100, 140))
    near = base[:-1] + [999]
    far = list(range(5000, 5040))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, tokens array<int>"
    )
    pairs = dd.token_minhash_near_dups(df, n=8, threshold=0.3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    assert all(p in {(1, 2)} for p in found)


def test_token_ngram_hashes_short_doc_empty(spark):
    df = spark.createDataFrame([(1, [1, 2, 3])], "doc_id long, tokens array<int>")
    out = df.select(dd.token_ngram_hashes(F.col("tokens"), n=8).alias("h")).collect()
    assert out[0].h == []


def test_simhash_near_texts_have_low_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", dd.simhash_hex(F.col("text")).alias("sh")
    ).collect()
    sh = {r.doc_id: r.sh for r in out}
    ham = lambda a, b: sum(1 for x, y in zip(a, b) if x != y)  # noqa: E731
    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])


def test_ngram_jaccard_pairs_bucketed(spark):
    df = spark.createDataFrame(
        [
            (1, "g1", "a b c d e f g h"),
            (2, "g1", "a b c d e f g x"),
            (3, "g2", "a b c d e f g h"),  # same text, different bucket → no pair
        ],
        "doc_id long, bucket string, text string",
    )
    pairs = dd.ngram_jaccard_pairs(df, "bucket", threshold=0.1).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_brute_force_topk_self_is_rank1(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.brute_force_topk(emb, queries, k=2).collect()
    rank1 = {r.query_id: r.vec_id for r in out if r.rank == 1}
    assert rank1 == {0: 0, 1: 1, 2: 2}  # cosine(v,v)=1 → self at rank 1


def test_lsh_topk_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(emb, queries, k=1).collect()
    approx = sim.lsh_bucketed_topk(emb, queries, dim=64, k=1, planes=3).collect()
    exact1 = {r.query_id: r.vec_id for r in exact if r.rank == 1}
    approx1 = {r.query_id: r.vec_id for r in approx if r.rank == 1}
    # self-match always lands in its own bucket → recall@1 is 100% here
    hits = sum(1 for q, v in exact1.items() if approx1.get(q) == v)
    assert hits >= 9


def test_lang_id_on_clear_samples(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on a mat and it is that"),
            (2, "der hund ist nicht mit der katze und das haus"),
            (3, "le chat est dans la maison et les chiens"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lid for r in df.select(
        "doc_id", tx.lang_id(F.col("text")).alias("lid")
    ).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_bounds(docs):
    rows = docs.select(tx.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_media_feature_plumbing(spark):
    media = mm.synth_media(spark, 50)
    feats = mm.extract_features(media, dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feature) == 8 for r in rows)
    assert all(-1.0 <= v < 1.0 for r in rows for v in r.feature)
    # deterministic: same blob → same feature
    again = {r.media_id: r.feature for r in mm.extract_features(
        mm.synth_media(spark, 50), dim=8, fake=True
    ).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_media_real_decode_raises(spark):
    media = mm.synth_media(spark, 5)
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, dim=8, fake=False).collect()
    assert "DecodeUnavailable" in str(ei.value) or "decode" in str(ei.value).lower()


def test_frame_sample_plan(spark):
    media = mm.synth_media(spark, 30)
    plan = mm.frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    assert rows and all(r["count"] >= 2 for r in rows)


def test_minhash_bucket_cap_drops_boilerplate(spark):
    # 30 identical docs form one mega-bucket; cap excludes them, the
    # distinct near-pair (40,41) survives
    base = "the quick brown fox jumps over the lazy dog again today"
    rows = [(i, "common boilerplate text repeated everywhere all the time ok")
            for i in range(30)]
    rows += [(40, base), (41, base.replace("today", "tomorrow"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dd.minhash_near_dups(df, threshold=0.3, max_bucket=10).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(40, 41)}
    uncapped = dd.minhash_near_dups(df, threshold=0.3).count()
    assert uncapped == 30 * 29 // 2 + 1  # all boilerplate pairs + (40,41)


def test_dup_clusters_connected_components(spark):
    # graph: {1-2, 2-3} chain, {10-11}, {20-21, 21-22, 20-22} triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    out = {r.member: r.cluster for r in dd.dup_clusters(pairs).collect()}
    # python union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert out == want
    assert out[3] == 1 and out[22] == 20 and out[11] == 10


def test_dup_clusters_long_chain(spark):
    # path 0-1-2-...-9 needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    out = {r.member: r.cluster for r in dd.dup_clusters(pairs).collect()}
    assert set(out.values()) == {0} and len(out) == 10


def test_dup_clusters_converges_in_log_rounds(spark):
    # pointer doubling makes rounds O(log diameter): a 100-node path
    # (diameter 99) must converge within 9 rounds — plain neighborhood
    # min-propagation would need ~99 and would now RAISE instead of
    # silently returning split clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a long, id_b long"
    )
    out = {
        r.member: r.cluster
        for r in dd.dup_clusters(pairs, max_iters=9).collect()
    }
    assert set(out.values()) == {0} and len(out) == 100


def test_dup_clusters_raises_on_non_convergence(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dd.dup_clusters(pairs, max_iters=2)


def test_repetition_features(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"),
         (2, " ".join(f"w{i}" for i in range(30))),
         (3, "one")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in docs.select(
        "doc_id", tx.repetition_features(F.col("text")).alias("f")
    ).select("doc_id", "f.*").collect()}
    assert out[1].dup_word_frac == 0.75
    assert out[1].top_bigram_frac == 1.0 and not out[1].rep_ok
    assert out[2].dup_word_frac == 0.0 and out[2].rep_ok
    # shorter than the n-gram: empty gram list scores 0, not garbage
    assert out[3].top_bigram_frac == 0.0 and out[3].top_trigram_frac == 0.0


def test_contamination_scores(spark):
    from vector_spark.dataprep.contamination import contamination_scores

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated words appear in this training document"),
         (3, "tiny")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "the quick brown fox jumps over a cliff")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           contamination_scores(corpus, bench, n=5).collect()}
    # doc 1 shares the 5-gram "the quick brown fox jumps" (+ one more)
    assert out[1].ngrams_overlap == 2 and out[1].ngrams_total == 5
    assert out[1].contamination == 0.4
    assert out[2].ngrams_overlap == 0 and out[2].contamination == 0.0
    assert out[3].ngrams_total == 0 and out[3].contamination == 0.0


def test_dup_ngram_fraction(spark):
    from vector_spark.dataprep.tokens import dup_ngram_fraction

    # docs 1 and 2 share their full 4-token window; doc 3 unique; doc 4 short
    d = spark.createDataFrame(
        [(1, [5, 6, 7, 8]), (2, [5, 6, 7, 8]), (3, [9, 10, 11, 12]),
         (4, [1, 2])],
        "doc_id long, tokens array<int>",
    )
    out = {r.doc_id: r for r in dup_ngram_fraction(d, n=4).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[3].dup_frac == 0.0 and out[3].ngrams_total == 1
    assert out[4].ngrams_total == 0 and out[4].dup_frac == 0.0


def test_vocab_remap(spark):
    from vector_spark.dataprep.tokens import vocab_remap

    d = spark.createDataFrame(
        [(1, [10, 20, 30, 10]), (2, [20, 99])],
        "doc_id long, tokens array<int>",
    )
    m = spark.createDataFrame(
        [(10, 0), (20, 1), (30, 2)], "old_id int, new_id int"
    )
    out = {r.doc_id: list(r.tokens)
           for r in vocab_remap(d, m, unk_id=-1).collect()}
    assert out == {1: [0, 1, 2, 0], 2: [1, -1]}


def test_span_corrupt_t5_invariants(spark):
    from vector_spark.dataprep.tokens import SPAN_SENTINEL_BASE, span_corrupt

    d = spark.createDataFrame(
        [(f"doc-{i}", list(range(i * 100, i * 100 + 30))) for i in range(20)],
        "doc_id string, tokens array<int>",
    )
    orig = {r.doc_id: list(r.tokens) for r in d.collect()}
    out = span_corrupt(d, rate=0.3).collect()
    assert any(len(r.targets) for r in out)  # masking actually happened
    for r in out:
        inputs, targets = list(r.inputs), list(r.targets)
        # sentinels appear in the same order in both streams
        s_in = [t for t in inputs if t >= SPAN_SENTINEL_BASE]
        s_tg = [t for t in targets if t >= SPAN_SENTINEL_BASE]
        assert s_in == s_tg == list(
            range(SPAN_SENTINEL_BASE, SPAN_SENTINEL_BASE + len(s_in)))
        # reconstruction: substituting each sentinel's target span back
        # into the inputs yields the original document
        spans: dict[int, list[int]] = {}
        cur = None
        for t in targets:
            if t >= SPAN_SENTINEL_BASE:
                cur = spans.setdefault(t, [])
            else:
                cur.append(t)
        rebuilt: list[int] = []
        for t in inputs:
            rebuilt.extend(spans[t] if t >= SPAN_SENTINEL_BASE else [t])
        assert rebuilt == orig[r.doc_id]


def test_epoch_order_is_reproducible_permutation(spark):
    from vector_spark.dataprep.mixing import epoch_order

    d = spark.createDataFrame(
        [(f"c-{i}",) for i in range(500)], "chunk_id string"
    )
    e1 = {r.chunk_id: r.position for r in epoch_order(d, epoch=1).collect()}
    # a permutation: every position 0..n-1 exactly once
    assert sorted(e1.values()) == list(range(500))
    # bucket count must not change the order (two-phase rank is exact)
    alt = {r.chunk_id: r.position
           for r in epoch_order(d, epoch=1, buckets=7).collect()}
    assert alt == e1
    # different epoch → different permutation; same epoch → identical
    e2 = {r.chunk_id: r.position for r in epoch_order(d, epoch=2).collect()}
    assert e2 != e1 and sorted(e2.values()) == list(range(500))


def test_fim_transform_psm_invariants(spark):
    from vector_spark.dataprep.tokens import (
        FIM_MIDDLE_TOK,
        FIM_PREFIX_TOK,
        FIM_SUFFIX_TOK,
        fim_transform,
    )

    d = spark.createDataFrame(
        [(f"doc-{i}", list(range(i * 100, i * 100 + 10))) for i in range(40)],
        "doc_id string, tokens array<int>",
    )
    orig = {r.doc_id: list(r.tokens) for r in d.collect()}
    out = fim_transform(d, rate=0.5).collect()
    n_fim = sum(r.fim for r in out)
    assert 0 < n_fim < 40  # hash selection hits some, not all
    for r in out:
        toks = list(r.tokens)
        if not r.fim:
            assert toks == orig[r.doc_id]
            continue
        # PSM layout: [PRE] prefix [SUF] suffix [MID] middle, lossless
        assert toks[0] == FIM_PREFIX_TOK and len(toks) == 13
        isuf = toks.index(FIM_SUFFIX_TOK)
        imid = toks.index(FIM_MIDDLE_TOK)
        prefix, suffix, middle = (
            toks[1:isuf], toks[isuf + 1:imid], toks[imid + 1:])
        assert prefix + middle + suffix == orig[r.doc_id]
    # deterministic: a second run selects the same docs with the same cuts
    again = {r.doc_id: list(r.tokens) for r in fim_transform(d, rate=0.5).collect()}
    assert again == {r.doc_id: list(r.tokens) for r in out}


def test_split_assign_deterministic_and_growth_stable(spark):
    from vector_spark.dataprep.mixing import split_assign

    small = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(200)], "doc_id string"
    )
    grown = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(400)], "doc_id string"
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in split_assign(small, fr).collect()}
    b = {r.doc_id: r.split for r in split_assign(grown, fr).collect()}
    # growth-stable: every original doc keeps its split
    assert all(b[k] == v for k, v in a.items())
    # all three splits occupied, roughly proportional
    from collections import Counter

    c = Counter(b.values())
    assert set(c) == {"train", "val", "test"} and c["train"] > c["val"]
    # a different salt reshuffles membership
    alt = {r.doc_id: r.split for r in split_assign(grown, fr, salt="v2").collect()}
    assert any(alt[k] != b[k] for k in alt)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_assign(small, {"train": 0.5})
    # single-fraction degenerate case: everything lands in that split
    only = split_assign(small, {"train": 1.0}).collect()
    assert {r.split for r in only} == {"train"}


def test_split_bounds_exact_rationals():
    from fractions import Fraction

    from vector_spark.dataprep.mixing import split_bounds

    b = dict(split_bounds({"train": 0.9, "val": 0.05, "test": 0.05}))

    def half_up(fr):
        return int(fr) + (1 if fr % 1 >= Fraction(1, 2) else 0)

    # bounds are round(exact_cumulative * 2^60) — 0.9 + 0.05 accumulates
    # to exactly 19/20, NOT float 0.9500000000000001 (which lands 128
    # hash values away and flips membership for hashes in that window)
    assert b["train"] == half_up(Fraction(9, 10) * (1 << 60))
    assert b["val"] == half_up(Fraction(19, 20) * (1 << 60))


def test_token_contamination_scores(spark):
    from vector_spark.dataprep.contamination import token_contamination_scores

    # doc 1 = benchmark doc exactly; doc 2 shares a suffix window; doc 3
    # disjoint; doc 4 too short for any 8-gram
    corpus = spark.createDataFrame(
        [(1, list(range(20))),
         (2, list(range(1000, 1010)) + list(range(12, 20))),
         (3, list(range(5000, 5020))),
         (4, [1, 2, 3])],
        "doc_id long, tokens array<int>",
    )
    bench = spark.createDataFrame(
        [(99, list(range(20)))], "doc_id long, tokens array<int>"
    )
    out = {r.doc_id: r for r in
           token_contamination_scores(corpus, bench, n=8).collect()}
    assert out[1].contamination == 1.0
    assert out[2].ngrams_overlap == 1  # window 12..19 survives
    assert 0.0 < out[2].contamination < 1.0
    assert out[3].contamination == 0.0
    assert out[4].ngrams_total == 0 and out[4].contamination == 0.0


def test_pack_sequences(spark):
    from vector_spark.dataprep.packing import pack_sequences

    d = spark.createDataFrame(
        [(0, 3), (1, 4), (2, 5), (3, 2)], "doc_id long, n long"
    )
    rows = {r.doc_id: r for r in
            pack_sequences(d, "n", seq_len=4, order_col="doc_id",
                           bucket_size=2).collect()}
    # cum: 3, 7, 12, 14 → intervals [0,3) [3,7) [7,12) [12,14)
    assert (rows[0].tok_start, rows[0].tok_end) == (0, 3)
    assert (rows[1].tok_start, rows[1].tok_end) == (3, 7)
    assert (rows[2].tok_start, rows[2].tok_end) == (7, 12)
    assert (rows[3].tok_start, rows[3].tok_end) == (12, 14)
    assert (rows[0].chunk_first, rows[0].chunk_last) == (0, 0)
    assert (rows[1].chunk_first, rows[1].chunk_last) == (0, 1)
    assert (rows[2].chunk_first, rows[2].chunk_last) == (1, 2)
    # bucket size must not change the answer (two-phase prefix sum)
    alt = {r.doc_id: (r.tok_start, r.tok_end) for r in
           pack_sequences(d, "n", seq_len=4, order_col="doc_id",
                          bucket_size=1000).collect()}
    assert alt == {k: (v.tok_start, v.tok_end) for k, v in rows.items()}


def test_pack_tokens_materializes_exact_stream(spark):
    from vector_spark.dataprep.packing import pack_tokens

    docs = [(i, list(range(i * 10, i * 10 + n)), n)
            for i, n in enumerate([3, 4, 5, 2])]
    d = spark.createDataFrame(docs, "_i long, tokens array<int>, n_tok long")
    out = {r.chunk_id: r for r in
           pack_tokens(d, seq_len=4, order_col="_i", bucket_size=2).collect()}
    stream = [t for _, toks, _ in docs for t in toks]
    expect = {k: stream[k * 4:(k + 1) * 4] for k in range((len(stream) + 3) // 4)}
    assert {k: list(v.tokens) for k, v in out.items()} == expect
    assert out[3].n_fill == 2  # trailing partial chunk kept


def test_pack_tokens_ignores_empty_docs(spark):
    from vector_spark.dataprep.packing import pack_tokens

    # doc 1 is empty and sits on a chunk boundary at the stream end —
    # must not fabricate a phantom empty chunk
    d = spark.createDataFrame(
        [(0, [1, 2, 3, 4], 4), (1, [], 0)],
        "_i long, tokens array<int>, n_tok long",
    )
    out = pack_tokens(d, seq_len=4, order_col="_i", bucket_size=2).collect()
    assert len(out) == 1 and list(out[0].tokens) == [1, 2, 3, 4]


def test_allocate_quotas_and_sample_mixture(spark):
    from vector_spark.dataprep.mixing import allocate_quotas, sample_mixture

    q = allocate_quotas({"a": 1, "b": 1, "c": 1}, 100)
    assert sum(q.values()) == 100 and sorted(q.values()) == [33, 33, 34]
    assert allocate_quotas({"a": 0.5, "b": 0.3, "c": 0.2}, 120) == {
        "a": 60, "b": 36, "c": 24,
    }

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    out = sample_mixture(df, {"a": 0.7, "b": 0.3}, 20)
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {"a": 14, "b": 6}
    # deterministic: same sample on re-execution
    again = sample_mixture(df, {"a": 0.7, "b": 0.3}, 20)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # shortfall surfaces: tiny source can't fill its quota
    small = sample_mixture(df.filter("doc_id < 4"), {"a": 0.9, "b": 0.1}, 20)
    got = {r.source: r["count"] for r in small.groupBy("source").count().collect()}
    assert got["a"] == 2 and got.get("b", 0) == 2


def test_pack_and_mixing_input_validation(spark):
    from vector_spark.dataprep.mixing import allocate_quotas
    from vector_spark.dataprep.packing import pack_sequences

    d = spark.createDataFrame([("a", 3)], "k string, n long")
    with pytest.raises(ValueError, match="numeric"):
        pack_sequences(d, "n", seq_len=4, order_col="k")
    with pytest.raises(ValueError):
        allocate_quotas({}, 10)
    with pytest.raises(ValueError):
        allocate_quotas({"a": -1.0, "b": 2.0}, 10)


def test_media_resize_plumbing(spark):
    media = mm.synth_media(spark, 60)
    out = mm.resize_media(media, 48, 40).orderBy("media_id").collect()
    assert out and all(r.kind == "image" for r in out)
    for r in out:
        # aspect fit: one dimension hits the box, neither exceeds it
        assert r.out_w <= 48 and r.out_h <= 40
        assert r.out_w == 48 or r.out_h == 40
        # fake raster contract: blob IS the resampled size
        assert r.out_bytes == 3 * r.out_w * r.out_h == len(r.blob)
    # deterministic across re-execution (retry safety)
    again = [r.blob for r in mm.resize_media(media, 48, 40)
             .orderBy("media_id").collect()]
    assert [r.blob for r in out] == again
    with pytest.raises(Exception) as ei:
        mm.resize_media(media, 48, 40, fake=False).collect()
    assert "resize" in str(ei.value).lower() or "DecodeUnavailable" in str(ei.value)


def test_paragraph_dedup_drops_shared_segments(spark):
    # doc 1 and doc 2 share their first 10-word segment; doc 2's copy drops
    seg_a = " ".join(f"w{i}" for i in range(10))
    seg_b = " ".join(f"x{i}" for i in range(10))
    seg_c = " ".join(f"y{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, f"{seg_a} {seg_b}"), (2, f"{seg_a} {seg_c}"), (3, seg_c)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.paragraph_dedup(df).collect()}
    assert out[1].n_segs == 2 and out[1].n_kept == 2
    assert out[2].n_segs == 2 and out[2].n_kept == 1  # seg_a already seen
    assert out[3].n_segs == 1 and out[3].n_kept == 0  # seg_c taken by doc 2
    assert out[3].text_digest is None
    # doc 2's surviving text is exactly seg_c
    import hashlib

    assert out[2].text_digest == hashlib.md5(seg_c.encode()).hexdigest()


def test_cluster_representatives_keep_best(spark):
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.7)],
        "doc_id long, quality double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "member long, cluster long"
    )
    kept = {
        r.doc_id: r.cluster
        for r in dd.cluster_representatives(docs, clusters).collect()
    }
    # cluster 1: quality tie 2 vs 3 → min id 2 wins; 4 is a singleton
    assert kept == {2: 1, 4: 4}


def test_hash_threshold_mixture_temperature(spark, docs):
    from vector_spark.dataprep.mixing import hash_threshold_mixture

    total = 40
    out = hash_threshold_mixture(docs, total=total, alpha=0.5)
    rows = out.select("doc_id", "source").collect()
    again = hash_threshold_mixture(docs, total=total, alpha=0.5)
    assert sorted((r.doc_id, r.source) for r in rows) == sorted(
        (r.doc_id, r.source)
        for r in again.select("doc_id", "source").collect()
    )  # deterministic — no RNG state
    # binomial around the quota: loose 3-sigma-ish bound
    assert 0 < len(rows) < 3 * total
    # explicit-weights path: sources not in the weight map are dropped
    only = hash_threshold_mixture(
        docs, total=20, weights={"src0": 1.0}
    )
    assert {r.source for r in only.select("source").collect()} <= {"src0"}


# --- distributed-trained quality classifier (classifier.py) ----------------


def test_classifier_trains_and_reproduces(spark, docs):
    """Weights are a pure function of the corpus: two independent trainings
    at different partitionings produce the identical weight vector (the
    int64 micro-quantized gradient sums are order-independent), and the
    student tracks the rule-based teacher on its own training corpus."""
    from vector_spark.dataprep import classifier as clf

    feats = clf.feature_frame(docs).persist()
    w1, n = clf.train(feats)
    w2, _ = clf.train(feats.repartition(13).persist())
    assert w1 == w2  # bit-exact, not approx
    assert n == docs.count()
    preds = clf.predictions(feats, w1)
    agree = preds.filter(F.col("label") == F.col("teacher")).count()
    assert agree / n >= 0.8  # linear distill of a thresholded linear-ish rule


def test_classifier_separates_planted_extremes(spark):
    """Clean prose scores above keyboard-mash junk after training."""
    from vector_spark.dataprep import classifier as clf

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "back home with a friend to share some food and water") 
    bad = "0,1;2.3!4?5(6)7 8 9 0,1;2.3!4?5(6)7 8 9 0,1;2.3!4?5(6)7 8 9"
    rows = [(i, good if i % 2 == 0 else bad) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = clf.feature_frame(df).persist()
    w, _ = clf.train(feats)
    out = {r.doc_id: r.score for r in clf.predictions(feats, w).collect()}
    assert out[0] > out[1]


def test_lsh_plan_properties():
    """Band/row planning: S-curve midpoint lands near the target, the
    curve is steep in the right direction, and budgets are respected."""
    import pytest

    from vector_spark.dataprep.dedup import lsh_plan

    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        p = lsh_plan(t, max_hashes=128)
        assert p["num_hashes"] <= 128
        assert p["bands"] * p["rows_per_band"] == p["num_hashes"]
        assert abs(p["t_star"] - t) < 0.08
        # S-curve: well below threshold mostly rejected, well above kept
        assert p["p_below"] < p["p_at_threshold"] < p["p_above"]
        assert p["p_above"] > 0.85
    # the repo's default 16-hash config corresponds to a mid threshold
    p16 = lsh_plan(0.5, max_hashes=16)
    assert p16["num_hashes"] <= 16 and p16["bands"] >= 2
    with pytest.raises(ValueError):
        lsh_plan(0.0)
    with pytest.raises(ValueError):
        lsh_plan(0.5, max_hashes=1)


def test_token_contamination_report_attribution(spark):
    """Per-benchmark attribution: each doc reports overlap against the
    right benchmark, full containment scores 1.0, non-overlap is absent."""
    from vector_spark.dataprep.contamination import token_contamination_report

    a = list(range(100, 120))
    b = list(range(500, 520))
    c = list(range(900, 920))
    corpus = spark.createDataFrame(
        [("da", a), ("db", b), ("dc", c)], "doc_id string, tokens array<int>"
    )
    benchmarks = {
        "A": spark.createDataFrame([("x", a)], "doc_id string, tokens array<int>"),
        "B": spark.createDataFrame([("y", b[:12])], "doc_id string, tokens array<int>"),
    }
    rows = {
        (r.doc_id, r.benchmark): r
        for r in token_contamination_report(corpus, benchmarks, n=8).collect()
    }
    assert set(rows) == {("da", "A"), ("db", "B")}
    assert rows[("da", "A")].contamination == 1.0
    # b has 13 8-grams; bench covers b[:12] → 5 of them
    assert rows[("db", "B")].ngrams_overlap == 5
    assert rows[("db", "B")].ngrams_total == 13


def test_token_novelty_scores(spark):
    from vector_spark.dataprep.contamination import token_novelty_scores

    old = spark.createDataFrame(
        [("o1", list(range(100, 120)))], "doc_id string, tokens array<int>"
    )
    new = spark.createDataFrame(
        [
            ("seen", list(range(100, 120))),       # fully in reference
            ("fresh", list(range(700, 720))),      # fully novel
            ("mixed", list(range(108, 128))),      # overlaps the tail
        ],
        "doc_id string, tokens array<int>",
    )
    got = {r.doc_id: r for r in token_novelty_scores(new, old, n=8).collect()}
    assert got["seen"].novelty == 0.0
    assert got["fresh"].novelty == 1.0
    # mixed: 13 grams, those starting at 108..112 are in the reference (5)
    assert got["mixed"].ngrams_novel == 8 and got["mixed"].ngrams_total == 13


def test_incremental_minhash_dedup(spark):
    from vector_spark.dataprep.dedup import (
        incremental_minhash_dedup,
        minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about database indexes here"),
        ],
        "doc_id long, text string",
    )
    index = minhash_index(corpus)
    new = spark.createDataFrame(
        [
            # near-copy of doc 1 (one word changed)
            (10, "the quick brown fox jumps over the lazy cat tonight"),
            # novel document
            (11, "totally fresh content on distributed shuffle tuning"),
            # exact copy of doc 2
            (12, "completely unrelated text about database indexes here"),
        ],
        "doc_id long, text string",
    )
    out = incremental_minhash_dedup(new, index, threshold=0.5)
    matches = {r.doc_id: r for r in out["matches"].collect()}
    assert 11 not in matches  # novel doc matches nothing
    assert matches[12].matched_id == 2 and matches[12].sig_sim == 1.0
    assert matches[10].matched_id == 1 and matches[10].sig_sim >= 0.5
    # the returned index rows extend the store: bands x new docs
    assert out["index"].count() == 3 * 4


def test_embedding_health(spark):
    from vector_spark.dataprep.similarity import embedding_health

    rows = [
        (1, [3.0, 4.0], "a"),          # norm 5
        (2, [0.0, 0.0], "a"),          # zero vector
        (3, [float("nan"), 1.0], "a"),  # non-finite
        (4, [1.0, 0.0, 0.0], "b"),     # different dim
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r.group_key: r for r in embedding_health(df).collect()}
    a = out["a"]
    assert (a.n_vectors, a.n_dims, a.dim) == (3, 1, 2)
    assert a.n_nonfinite == 1 and a.n_zero == 1
    assert a.norm_max == 5.0
    assert out["b"].dim == 3 and out["b"].n_zero == 0


def test_bloom_no_false_negatives_and_exact_dedup(spark):
    from vector_spark.dataprep.dedup import (
        bloom_incremental_dedup,
        bloom_might_contain,
        build_bloom_words,
        incremental_dedup,
    )
    from pyspark.sql import functions as F

    store = spark.createDataFrame(
        [(F"fp-{i}",) for i in range(200)], "fp string"
    )
    words = build_bloom_words(store, "fp", num_bits=1 << 12)
    # zero false negatives: every stored key tests positive
    hits = store.filter(bloom_might_contain(F.col("fp"), words)).count()
    assert hits == 200

    old = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)], "doc_id long, text string"
    )
    _, store_fps = incremental_dedup(old, spark.createDataFrame(
        [], "fp string, first_doc_id long"))
    new = spark.createDataFrame(
        # 10 seen before, 10 fresh, plus an in-batch dup pair
        [(100 + i, f"doc number {i}") for i in range(10)]
        + [(200 + i, f"fresh doc {i}") for i in range(10)]
        + [(300, "twin text"), (301, "twin text")],
        "doc_id long, text string",
    )
    kept_b, fps_b = bloom_incremental_dedup(new, store_fps, num_bits=1 << 12)
    kept_e, _ = incremental_dedup(new, store_fps)
    assert sorted(r.doc_id for r in kept_b.collect()) == sorted(
        r.doc_id for r in kept_e.collect()
    )
    ids = sorted(r.doc_id for r in kept_b.collect())
    assert ids == sorted(list(range(200, 210)) + [300])
    assert fps_b.count() == 11


def test_token_budget_trim_prefix_rule(spark):
    from vector_spark.dataprep.mixing import token_budget_trim

    rows = [(f"d{i}", "a" if i < 6 else "b", 10 + i) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = token_budget_trim(df, budget=30, buckets=4)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    for src, kept in by_src.items():
        kept.sort(key=lambda r: r.cum_tokens)
        # running totals are consistent and within budget
        run = 0
        for r in kept:
            run += r.n_tok
            assert r.cum_tokens == run
            assert r.cum_tokens <= 30
    # determinism: the same call returns the same set
    again = {r.doc_id for r in token_budget_trim(df, budget=30, buckets=4).collect()}
    assert again == {r.doc_id for r in got}


def test_leakage_safe_split_keeps_clusters_together(spark):
    from vector_spark.dataprep.mixing import leakage_safe_split

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 11)], "doc_id long"
    )
    # chain 1-2-3 (transitive: 1-3 never a candidate pair) and pair 7-8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.split_key, r.split)
        for r in leakage_safe_split(
            docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
        ).collect()
    }
    assert len(out) == 10
    # the whole chain shares the min-id representative AND the split
    assert out[1] == out[2] == out[3]
    assert out[1][0] == "1"
    assert out[7] == out[8] and out[7][0] == "7"
    # singletons key on their own id
    assert out[5][0] == "5"
    # determinism
    again = {
        r.doc_id: (r.split_key, r.split)
        for r in leakage_safe_split(
            docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
        ).collect()
    }
    assert again == out


def test_split_leakage_audit_counts_cross_split_pairs(spark):
    from vector_spark.dataprep.mixing import (
        leakage_safe_split,
        split_leakage_audit,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (7, "test"), (8, "test")],
        "doc_id long, split string",
    )
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.leaked)
        for r in split_leakage_audit(pairs, splits).collect()
    }
    assert got == {("train", "val"): (2, True), ("test", "test"): (1, False)}

    # the safe split audits clean by construction
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    safe = leakage_safe_split(
        docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    audit = split_leakage_audit(pairs, safe).collect()
    assert all(not r.leaked for r in audit)
    assert sum(r.n_pairs for r in audit) == 3


def test_quality_percentile_filter(spark):
    from vector_spark.dataprep.text import quality_percentile_filter

    rows = []
    # source a: scores 1..10; source b: scores 91..100 — an absolute
    # cutoff would keep all of b and none of a; the relative filter
    # keeps the top 30% of EACH
    for i in range(1, 11):
        rows.append((f"a{i}", "a", float(i)))
        rows.append((f"b{i}", "b", float(90 + i)))
    df = spark.createDataFrame(rows, "doc_id string, source string, quality double")
    kept = sorted(r.doc_id for r in
                  quality_percentile_filter(df, 0.3).collect())
    assert kept == ["a10", "a8", "a9", "b10", "b8", "b9"]
    # ties break deterministically by id
    tied = spark.createDataFrame(
        [("x1", "s", 5.0), ("x2", "s", 5.0), ("x3", "s", 5.0)],
        "doc_id string, source string, quality double",
    )
    kept2 = sorted(r.doc_id for r in
                   quality_percentile_filter(tied, 1 / 3).collect())
    assert kept2 == ["x1"]


def test_script_profile_fractions_and_mojibake(spark):
    from vector_spark.dataprep.text import script_profile
    from pyspark.sql import functions as F

    text = "Hello мир 你好 ��"  # 15 chars
    df = spark.createDataFrame([(text,), ("abc123",)], "text string")
    a, b = df.select(script_profile(F.col("text")).alias("p")).collect()
    p = a.p
    assert abs(p.latin_frac - round(5 / 15, 6)) < 1e-9
    assert abs(p.cyrillic_frac - round(3 / 15, 6)) < 1e-9
    assert abs(p.cjk_frac - round(2 / 15, 6)) < 1e-9
    assert p.arabic_frac == 0.0 and p.digit_frac == 0.0
    assert abs(p.other_frac - round(2 / 15, 6)) < 1e-9  # U+FFFD is "other"
    assert p.mojibake == 2
    q = b.p
    assert q.latin_frac == 0.5 and q.digit_frac == 0.5
    assert q.mojibake == 0 and q.other_frac == 0.0


def test_winnow_containment_finds_quoted_doc(spark):
    quote = ("the quick brown fox jumps over the lazy dog while the "
             "rain in spain falls mainly on the plain tonight")
    article = ("breaking news from the city council meeting today "
               "officials said that " + quote + " and further remarks "
               "followed about infrastructure budgets and planning")
    other = ("completely unrelated content about distributed query "
             "engines and columnar storage formats for analytics")
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, other)], "doc_id long, text string"
    )
    rows = dd.winnow_containment(df, min_ratio=0.5, min_fps=3).collect()
    got = {(r.id_small, r.id_big): r.ratio for r in rows}
    assert (1, 2) in got and got[(1, 2)] >= 0.5  # quote contained in article
    assert all(p == (1, 2) for p in got)  # no false containment with doc 3
    # near-dup pass misses it: jaccard-style shared-count is asymmetric-blind
    # (the pair exists only because containment uses the SMALL side's total)
    r = rows[0]
    assert r.n_small < 40 and r.shared <= r.n_small


def test_winnow_containment_robust_to_capped_boilerplate(spark):
    """The ratio counts DISCRIMINATIVE fingerprints on both sides:
    sitewide boilerplate (fps in > fp_cap docs) must not dilute n_small
    — with an unpruned denominator, a quote page that is mostly shared
    chrome scores under the threshold and the containment is missed."""
    chrome = " ".join(
        f"sitewide navigation footer item{i} copyright terms privacy"
        for i in range(8)
    )
    quote = ("the quick brown fox jumps over the lazy dog while the "
             "rain in spain falls mainly on the plain tonight")
    article = ("breaking news from the council meeting officials said "
               + quote + " and remarks followed about budgets planning "
               "infrastructure transit housing water power schools")
    # quote page: mostly boilerplate + the quote; article has NO chrome
    rows = [(1, chrome + " " + quote), (2, article)]
    # enough chrome-only pages to push every chrome fp past fp_cap
    rows += [(10 + i, chrome) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_small, r.id_big): r.ratio
        for r in dd.winnow_containment(
            df, min_ratio=0.7, min_fps=3, fp_cap=5
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.7, got


def test_containment_filter_drops_contained_doc(spark):
    quote = ("the quick brown fox jumps over the lazy dog while the "
             "rain in spain falls mainly on the plain tonight")
    article = ("breaking news from the city council meeting today "
               "officials said that " + quote + " and further remarks "
               "followed about infrastructure budgets and planning")
    other = ("completely unrelated content about distributed query "
             "engines and columnar storage formats for analytics")
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, other)], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id
        for r in dd.containment_filter(df, min_ratio=0.5, min_fps=3).collect()
    )
    assert kept == [2, 3]  # the quote is dropped, its container kept


def test_dup_weights_soft_dedup(spark):
    from vector_spark.dataprep.mixing import dup_weights

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # one 3-chain (1-2, 2-3) and one pair (5-6); 0/4 are unique
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.cluster_size, r.dup_weight)
        for r in dup_weights(docs, pairs).collect()
    }
    third = 1.0 / 3.0
    assert out[0] == (1, 1.0) and out[4] == (1, 1.0)
    assert out[1] == (3, third) and out[2] == (3, third) and out[3] == (3, third)
    assert out[5] == (2, 0.5) and out[6] == (2, 0.5)
    # total signal = one page per cluster + uniques
    assert abs(sum(w for _, w in out.values()) - 4.0) < 1e-12
