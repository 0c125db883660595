"""Benchmark-contamination detection for training corpora.

The standard decontamination step in LLM data pipelines: flag training
documents sharing word n-grams with an evaluation/benchmark set (the
method popularized by the GPT-3 and PaLM papers — n-gram collision
against held-out eval data). Engine shape:

- benchmark set → distinct n-gram digest dim (small: benchmarks are
  thousands of documents, corpora are billions) → broadcast
- corpus → per-document DISTINCT n-gram digests → explode →
  broadcast semi-join against the dim → per-doc overlap count

The shuffle carries (doc_id, 16-byte digest) pairs only; the join is a
broadcast hash join, so the corpus-side scan streams once with no
corpus-sized shuffle. Digests are md5 hex strings reproducible by any
SQL engine (the DuckDB oracle recomputes them exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.dataprep.text import _word_ngrams, words
from vector_spark.functions.objects import let


def ngram_digests(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """doc rows → (doc_id, digest) with one row per DISTINCT word n-gram.

    The words array is bound ONCE per row via a let-binding: an inline
    ``words()`` subtree inside the n-gram lambda is re-evaluated per gram
    position (regex + split per gram — measured ~4× the whole scan)."""
    grams = let(
        words(F.col(text_col)),
        lambda ws: F.array_distinct(_word_ngrams(ws, n)),
    )
    return df.select(
        "doc_id", F.explode(F.transform(grams, F.md5)).alias("digest")
    )


def benchmark_digest_dim(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """The broadcastable benchmark dim: distinct n-gram digests."""
    return ngram_digests(benchmark, text_col, n).select("digest").distinct()


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document contamination: overlapping / total distinct n-grams.

    Returns (doc_id, ngrams_total, ngrams_overlap, contamination) — filter
    ``contamination >= tau`` (typically 0.3-0.8) to drop contaminated docs.
    Documents with fewer than ``n`` words score 0 (no n-grams).
    """
    dim = F.broadcast(benchmark_digest_dim(benchmark, text_col, n))
    shingles = ngram_digests(corpus, text_col, n)
    return _overlap_scores(corpus, shingles, dim)


def token_ngram_digests(
    df: DataFrame, tokens_col: str = "tokens", n: int = 8
) -> DataFrame:
    """doc rows → (doc_id, digest) with one row per DISTINCT token n-gram
    — the pre-tokenized twin of ``ngram_digests``: digests are int64
    polynomial folds (dedup.token_ngram_hashes), zero md5/strings, and the
    explode carries 8-byte longs instead of 32-byte hex digests."""
    from vector_spark.dataprep.dedup import token_ngram_hashes

    return df.select(
        "doc_id",
        F.explode(token_ngram_hashes(F.col(tokens_col), n)).alias("digest"),
    )


def token_benchmark_dim(
    benchmark: DataFrame, tokens_col: str = "tokens", n: int = 8
) -> DataFrame:
    return token_ngram_digests(benchmark, tokens_col, n).select("digest").distinct()


def token_contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    tokens_col: str = "tokens",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination DIRECTLY over token sequences: per-doc
    share of token n-grams colliding with the benchmark set. Same
    broadcast-dim plan as the text path (corpus streams once; shuffle
    carries (doc_id, int64) pairs only)."""
    dim = F.broadcast(token_benchmark_dim(benchmark, tokens_col, n))
    shingles = token_ngram_digests(corpus, tokens_col, n)
    return _overlap_scores(corpus, shingles, dim)


def _overlap_scores(
    corpus: DataFrame, shingles: DataFrame, dim: DataFrame
) -> DataFrame:
    hits = (
        shingles.join(dim.withColumn("__hit", F.lit(1)), "digest", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ngrams_total"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("ngrams_overlap"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ngrams_total", F.lit(0)).alias("ngrams_total"),
            F.coalesce("ngrams_overlap", F.lit(0)).alias("ngrams_overlap"),
            F.when(
                F.coalesce("ngrams_total", F.lit(0)) > 0,
                F.round(F.col("ngrams_overlap") / F.col("ngrams_total"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def token_contamination_report(
    corpus: DataFrame,
    benchmarks: dict[str, DataFrame],
    tokens_col: str = "tokens",
    n: int = 8,
    min_overlap: float = 0.0,
) -> DataFrame:
    """Multi-benchmark contamination ATTRIBUTION: for every (doc,
    benchmark) pair with any n-gram collision, the overlap share against
    THAT benchmark — the report that tells a release process not just
    "this doc is contaminated" but WHICH eval set leaked (the per-suite
    accounting in Brown et al. 2020 App. C / GPT-3's decontamination).

    Plan: the named benchmark dims union into ONE (benchmark, digest)
    broadcast dim — benchmarks are eval sets, tiny by definition — so
    the corpus still streams exactly once regardless of how many
    benchmarks are registered; the shuffle carries (doc, benchmark,
    count) partials. Only rows with contamination > ``min_overlap``
    are emitted (the all-pairs zero matrix would be |docs|·|benchmarks|
    of noise)."""
    if not benchmarks:
        raise ValueError("benchmarks must be non-empty")
    dim = None
    for name, bdf in sorted(benchmarks.items()):
        d = token_benchmark_dim(bdf, tokens_col, n).withColumn(
            "benchmark", F.lit(name)
        )
        dim = d if dim is None else dim.unionByName(d)
    shingles = token_ngram_digests(corpus, tokens_col, n)
    totals = shingles.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ngrams_total")
    )
    hits = (
        shingles.join(F.broadcast(dim), "digest")
        .groupBy("doc_id", "benchmark")
        .agg(F.count(F.lit(1)).alias("ngrams_overlap"))
    )
    return (
        hits.join(totals, "doc_id")
        .withColumn(
            "contamination",
            F.round(F.col("ngrams_overlap") / F.col("ngrams_total"), 4),
        )
        .filter(F.col("contamination") > min_overlap)
    )


def token_novelty_scores(
    corpus: DataFrame,
    reference: DataFrame,
    tokens_col: str = "tokens",
    n: int = 8,
) -> DataFrame:
    """Corpus-version diff: per document of ``corpus``, the share of its
    distinct token n-grams NOT present anywhere in ``reference`` (the
    previous corpus version / an existing training set) — the "how much
    genuinely new content does this crawl add" signal that gates
    re-training and prices incremental data.

    Scale posture — deliberately DIFFERENT from decontamination: the
    reference here is corpus-sized, so its digest set cannot broadcast.
    Both sides reduce to (digest) / (doc_id, digest) streams of 8-byte
    int64 folds and meet in a SHUFFLE left-anti join on the digest — the
    join carries hashes only, never tokens, and partitions by digest
    uniformly (hash keys have no skew). At 10^12 sequences the reference
    digest table is the thing you persist (bucketed by digest) so each
    new crawl anti-joins co-located, mirroring `incremental_dedup`'s
    store pattern at n-gram granularity."""
    sh = token_ngram_digests(corpus, tokens_col, n)
    ref_dim = token_ngram_digests(reference, tokens_col, n).select(
        "digest"
    ).distinct()
    novel = (
        sh.join(ref_dim, "digest", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("ngrams_novel"))
    )
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ngrams_total"))
    return (
        corpus.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ngrams_total", F.lit(0)).alias("ngrams_total"),
            F.coalesce("ngrams_novel", F.lit(0)).alias("ngrams_novel"),
            F.when(
                F.coalesce("ngrams_total", F.lit(0)) > 0,
                # coalesce INSIDE the division: a doc fully covered by the
                # reference has no `novel` row (left-join null), which must
                # score 0.0, not null
                F.round(
                    F.coalesce("ngrams_novel", F.lit(0))
                    / F.col("ngrams_total"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        )
    )


def _token_sig_index(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(doc_id, sig, band_idx, band_key) over token n-gram minhash — the
    token-native twin of dedup.minhash_index, with the same two
    materialization rules: persist barriers around the interpreted HOF
    signature steps, and exclusion of too-short docs (empty gram sets
    band to a constant mega-bucket key otherwise)."""
    from vector_spark.dataprep.dedup import (
        lsh_band_keys,
        minhash_signature_int,
        token_ngram_hashes,
    )

    rows_per_band = num_hashes // bands
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            token_ngram_hashes(F.col(tokens_col), n).alias("__g"),
        )
        .persist()
        .filter(F.size("__g") > 0)
        .withColumn("sig", minhash_signature_int(F.col("__g"), num_hashes))
        .withColumn(
            "__bands", lsh_band_keys(F.col("sig"), bands, rows_per_band)
        )
        .persist()
    )
    return base.select(
        "doc_id", "sig",
        F.posexplode("__bands").alias("band_idx", "band_key"),
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: corpus sequences whose
    token n-gram minhash signature LSH-collides with a benchmark
    sequence and scores ≥ ``threshold`` signature similarity — catches
    the paraphrased/truncated eval leaks the exact n-gram-digest
    anti-join (:func:`decontaminate`) cannot (Lee et al. dedup-and-
    decontaminate follow-ups use exactly this banded fuzzy pass).

    Returns (doc_id, bench_id, sig_sim): the corpus rows to DROP, each
    with its best-matching benchmark id (ties to smallest id). Plan:
    both sides band (benchmark dim is tiny); the join carries band rows
    only; distinct signatures collapse exact-copy clusters first."""
    c_idx = _token_sig_index(
        corpus, tokens_col, id_col, n, num_hashes, bands
    )
    b_idx = _token_sig_index(
        benchmark, tokens_col, id_col, n, num_hashes, bands
    )
    from vector_spark.dataprep.dedup import sig_similarity

    b_sig = b_idx.groupBy(
        F.col("sig").alias("__bsig"),
        "band_idx",
        F.col("band_key").alias("__bkey"),
    ).agg(F.min("doc_id").alias("__bid"))
    c_sig = c_idx.groupBy("sig", "band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("__n")
    )
    cand = (
        c_sig.join(
            b_sig,
            (c_sig["band_idx"] == b_sig["band_idx"])
            & (c_sig["band_key"] == b_sig["__bkey"]),
        )
        .select("sig", "__bid", "__bsig")
        .distinct()
    )
    scored = cand.select(
        "sig",
        F.col("__bid").alias("bench_id"),
        sig_similarity(F.col("sig"), F.col("__bsig"), num_hashes).alias(
            "sig_sim"
        ),
    ).filter(F.col("sig_sim") >= threshold)
    # best match = max similarity, ties to SMALLEST bench id — two
    # aggregates on the candidate dim (id types may be strings, so a
    # numeric negation tie-break inside one max_by is not portable)
    top = scored.groupBy("sig").agg(F.max("sig_sim").alias("sig_sim"))
    best = (
        scored.join(top, ["sig", "sig_sim"])
        .groupBy("sig", "sig_sim")
        .agg(F.min("bench_id").alias("bench_id"))
    )
    return (
        c_idx.filter(F.col("band_idx") == 0)
        .select("doc_id", "sig")
        .join(best, "sig")
        .select("doc_id", "bench_id", "sig_sim")
    )
