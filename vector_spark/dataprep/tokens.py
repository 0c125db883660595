"""Token-id corpus statistics over the BASELINE ``tokens array<int>``
payload — the vocabulary-level view a training-data pipeline needs
before and after curation (the reference engine has no token surface;
beyond-reference dataprep like the dedup/ANN family).

Scale shapes:

- :func:`token_topk` — explode + count + distributed top-k. The groupBy
  is map-side combined, so the shuffle carries ≤ |vocab| partial rows
  per task (a tokenizer vocab is 32k-256k ids — kilobytes), and the
  top-k plans as TakeOrderedAndProject, never a global sort.
- :func:`vocab_oov` — per-document out-of-vocabulary occurrence rate
  against a vocab dimension: the vocab broadcasts (≤ a few MB for any
  real tokenizer), OOV occurrences are a broadcast LEFT ANTI join on the
  exploded stream, and the per-doc re-aggregation ships (doc_id, count)
  partials only. No step shuffles the token stream itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_topk(
    df: DataFrame,
    k: int = 100,
    tokens_col: str = "tokens",
) -> DataFrame:
    """The ``k`` most frequent token ids (count desc, token asc — a total
    order, so the cut is deterministic). Returns (token, n)."""
    return (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )


def vocab_oov(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-document OOV stats against ``vocab`` (a one-column ``token``
    dimension): occurrence count of tokens outside the vocab and the
    rate over the document's length. Documents fully in-vocab are kept
    (n_oov = 0). Returns (doc_id, n_tok, n_oov, oov_rate)."""
    ex = df.select(id_col, F.explode(tokens_col).alias("token"))
    oov = (
        ex.join(F.broadcast(vocab.select("token")), "token", "left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    return (
        df.select(id_col, F.col(n_tok_col).cast("long").alias("n_tok"))
        .join(oov, id_col, "left")
        .withColumn("n_oov", F.coalesce(F.col("n_oov"), F.lit(0)))
        .withColumn(
            "oov_rate", F.round(F.col("n_oov") / F.col("n_tok"), 6)
        )
    )


def corpus_vocab(
    df: DataFrame,
    size: int,
    tokens_col: str = "tokens",
) -> DataFrame:
    """A corpus-derived vocab: the ``size`` most frequent tokens (the
    deterministic :func:`token_topk` cut), as a (token) dimension —
    what a frequency-truncated tokenizer retraining would keep."""
    return token_topk(df, k=size, tokens_col=tokens_col).select("token")


# FIM sentinel ids live just above the generator's 50257-id vocab (callers
# with a real tokenizer pass their own reserved ids)
FIM_PREFIX_TOK, FIM_SUFFIX_TOK, FIM_MIDDLE_TOK = 50300, 50301, 50302


def fim_transform(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    rate: float = 0.5,
    prefix_tok: int = FIM_PREFIX_TOK,
    suffix_tok: int = FIM_SUFFIX_TOK,
    middle_tok: int = FIM_MIDDLE_TOK,
    salt: str = "fim",
) -> DataFrame:
    """Deterministic fill-in-the-middle transformation (the FIM objective
    of Bavarian et al. 2022, used for code/infilling models): a ``rate``
    fraction of documents is rewritten from ``[tokens]`` to PSM order
    ``[PRE] prefix [SUF] suffix [MID] middle``, the rest pass through.

    Everything derives from md5 hashes of (salt, id) — selection AND the
    two cut points — so the transform is a pure shuffle-free projection,
    retry-stable, reproducible across engines (the oracle recomputes it
    in SQL), and re-runnable: unlike RNG-based FIM, a retried partition
    rewrites the same docs at the same cuts. Adds a ``fim`` flag.

    Cuts: a = h1 mod (L+1), b = a + h2 mod (L-a+1) → 0 ≤ a ≤ b ≤ L,
    every split (including empty prefix/middle/suffix) reachable.
    """
    from vector_spark.dataprep.dedup import shingle_hash64

    def h(tag: str):
        return shingle_hash64(
            F.concat(F.lit(f"{salt}{tag}~"), F.col(id_col).cast("string"))
        )

    toks = F.col(tokens_col)
    size = F.size(toks)
    sel = (h("") % 10_000) < int(round(rate * 10_000))
    a = (h("1") % (size + 1)).cast("int")
    b = (a + h("2") % (size - a + 1)).cast("int")
    psm = F.concat(
        F.array(F.lit(prefix_tok)),
        F.slice(toks, 1, a),
        F.array(F.lit(suffix_tok)),
        F.slice(toks, b + 1, size - b),
        F.array(F.lit(middle_tok)),
        F.slice(toks, a + 1, b - a),
    )
    return df.withColumn("fim", sel).withColumn(
        tokens_col, F.when(sel, psm).otherwise(toks)
    )


SPAN_SENTINEL_BASE = 50310


def span_corrupt(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    rate: float = 0.15,
    salt: str = "t5",
    sentinel_base: int = SPAN_SENTINEL_BASE,
    max_spans: int = 100,
) -> DataFrame:
    """Deterministic T5-style span corruption: each token is masked with
    probability ``rate`` (hash of (salt, id, position) — RNG-free and
    retry-stable), consecutive masked tokens form a span, span ``s`` is
    replaced in the INPUT by sentinel ``base+s`` and emitted in the
    TARGET as ``base+s`` followed by the original span tokens (the
    Raffel et al. 2020 objective layout).

    Sentinels are CAPPED at ``max_spans`` (T5 reserves a fixed block of
    100 sentinel ids): spans past the cap stay unmasked, so sentinel ids
    never bleed into real-token id space on long documents.

    Returns (id, inputs array<int>, targets array<int>). Plan: one
    posexplode → two window passes (span starts, span index) → one
    groupBy(id) rebuilding both arrays in position order — the token
    stream crosses the shuffle once, like any per-token relabeling.
    """
    from pyspark.sql import Window

    from vector_spark.dataprep.dedup import shingle_hash64

    pct = int(round(rate * 10_000))
    pos = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(tokens_col)).alias("__p", "__t"),
    )
    h = shingle_hash64(
        F.concat(
            F.lit(f"{salt}~"),
            F.col("__id").cast("string"),
            F.lit("~"),
            F.col("__p").cast("string"),
        )
    )
    w = Window.partitionBy("__id").orderBy("__p")
    marked = (
        pos.withColumn("__m", (h % 10_000) < pct)
        .withColumn(
            "__start",
            F.col("__m") & ~F.coalesce(F.lag("__m").over(w), F.lit(False)),
        )
        .withColumn(
            "__s",
            F.sum(F.col("__start").cast("int")).over(w) - 1,
        )
    )
    # sentinel cap: spans with index >= max_spans revert to unmasked
    # (whole spans — the cap tests the span index, which is constant
    # within a span, so no span is half-masked)
    capped = F.col("__s") < max_spans
    m_eff = F.col("__m") & capped
    start_eff = F.col("__start") & capped
    sent = F.lit(sentinel_base) + F.col("__s")
    # input entry per position: token if unmasked, sentinel at span starts,
    # nothing mid-span; target entry: [sentinel, token] at span starts,
    # [token] mid-span, nothing if unmasked
    inp = F.when(~m_eff, F.array(F.col("__t"))).when(
        start_eff, F.array(sent.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    tgt = F.when(
        start_eff, F.array(sent.cast("int"), F.col("__t"))
    ).when(m_eff, F.array(F.col("__t"))).otherwise(
        F.array().cast("array<int>")
    )
    rebuilt = (
        marked.select("__id", "__p", inp.alias("__inp"), tgt.alias("__tgt"))
        .groupBy("__id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p", "__inp"))),
                    lambda s: s["__inp"],
                )
            ).alias("inputs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p", "__tgt"))),
                    lambda s: s["__tgt"],
                )
            ).alias("targets"),
        )
    )
    # posexplode emits nothing for zero-token docs — rejoin so they
    # survive with empty streams instead of silently disappearing
    empty = F.array().cast("array<int>")
    return (
        df.select(F.col(id_col))
        .join(rebuilt.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("inputs", empty).alias("inputs"),
            F.coalesce("targets", empty).alias("targets"),
        )
    )


def vocab_remap(
    df: DataFrame,
    mapping: DataFrame,
    tokens_col: str = "tokens",
    unk_id: int = 0,
    old_col: str = "old_id",
    new_col: str = "new_id",
) -> DataFrame:
    """Tokenizer migration: rewrite every token id through an
    (old_id → new_id) mapping dimension; ids absent from the mapping
    become ``unk_id``. The mapping is a vocab-sized dim (≤ a few MB for
    any real tokenizer) collected once and applied as a single JVM
    ``transform`` over a broadcast map literal — a pure scan-side
    projection: no explode, no join, no shuffle, and the array never
    leaves its row.
    """
    pairs = [(int(r[old_col]), int(r[new_col])) for r in mapping.collect()]
    m = F.create_map(
        *[F.lit(x) for old, new in pairs for x in (old, new)]
    )
    from vector_spark.functions.objects import let

    # bind the map literal once — inlining it into the lambda would copy
    # the (vocab-sized) literal tree per reference
    return df.withColumn(
        tokens_col,
        let(
            m,
            lambda mm: F.transform(
                F.col(tokens_col),
                lambda t: F.coalesce(mm[t], F.lit(unk_id)).cast("int"),
            ),
        ),
    )


def dup_ngram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Memorization-risk signal: per document, the fraction of token
    n-gram OCCURRENCES whose n-gram appears at least ``min_count`` times
    across the whole corpus (the corpus-wide duplicate-text analyses of
    Lee et al. 2021 / Gopher, at token level; `text.dup_word_frac` is the
    WITHIN-document repetition twin).

    Plan: occurrence-level n-gram hashes (int64 folds, multiplicity
    preserved) explode once; corpus counts are a map-side-combined
    groupBy on the 8-byte hash; the count joins back on the same hash
    and re-aggregates per doc — two shuffles of (id|hash, count) pairs,
    never the token arrays. Docs shorter than ``n`` score 0.
    """
    from vector_spark.dataprep.dedup import token_ngram_hashes

    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            token_ngram_hashes(F.col(tokens_col), n, distinct=False)
        ).alias("__g"),
    )
    counts = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__cnt"))
    per_doc = (
        grams.join(counts, "__g")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("ngrams_total"),
            F.sum((F.col("__cnt") >= min_count).cast("long")).alias(
                "ngrams_dup"
            ),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("ngrams_total", F.lit(0)).alias("ngrams_total"),
            F.coalesce("ngrams_dup", F.lit(0)).alias("ngrams_dup"),
            F.when(
                F.coalesce("ngrams_total", F.lit(0)) > 0,
                F.round(F.col("ngrams_dup") / F.col("ngrams_total"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
