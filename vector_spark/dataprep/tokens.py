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

from pyspark.sql import Column, DataFrame
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


def pow2_bucket(n: Column) -> Column:
    """Smallest power of two >= ``n`` (n >= 1), as pure integer math:
    ``1 << bit_length(n - 1)``. Spark has no clz/bit_length builtin, so
    the bit length is the string length of ``bin(n - 1)`` (and bin(0) is
    "0", whose length 1 would be wrong, hence the n==1 special case) —
    closed-form, engine-portable (DuckDB: format('{:b}', n-1)), and free
    of float log2 edge cases at exact powers of two."""
    return (
        F.when(n <= 1, F.lit(1))
        .otherwise(
            # F.shiftleft only takes a literal shift — call the SQL
            # function directly to shift by a column
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.length(F.bin(n - 1)).cast("int"),
            )
        )
        .cast("long")
    )


def length_histogram(
    df: DataFrame,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Dynamic-batching planner input: bucket every sequence into the
    smallest power-of-two context length that holds it and report, per
    bucket, the doc count, real token mass, and the padding waste a
    pad-to-bucket batching scheme would pay (`pad_waste` tokens,
    `pad_frac` of the padded volume). The whole computation is one
    map-side-combined aggregate over scan-side column math — the token
    arrays are never read (column pruning drops them), nothing but the
    per-bucket partials crosses the shuffle, so the plan is identical at
    10^12 rows."""
    n = F.col(n_tok_col).cast("long")
    b = pow2_bucket(n)
    return (
        df.select(b.alias("bucket_len"), n.alias("__n"))
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("tokens_total"),
            F.sum(F.col("bucket_len") - F.col("__n")).alias("pad_waste"),
        )
        .withColumn(
            "pad_frac",
            F.round(
                F.col("pad_waste")
                / (F.col("bucket_len") * F.col("n_docs")),
                6,
            ),
        )
    )


def strided_chunks(
    df: DataFrame,
    width: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Sliding-window chunking for LM evaluation (the standard strided
    perplexity protocol: contexts of ``width`` tokens advancing by
    ``stride``, each chunk scoring only the ``n_new`` tokens not already
    scored by its predecessor). Chunk ``k`` covers token positions
    ``[k*stride, min(k*stride + width, n))``; chunks stop once the
    previous window already reached the end of the document, i.e.
    ``n_chunks = 1 + max(0, ceil((n - width) / stride))``.

    Plan shape: a pure scan-side ``sequence``+``explode`` over the chunk
    index followed by an ``F.slice`` of the in-row token array — no join,
    no shuffle; the ~``width/stride``× token expansion is inherent to the
    protocol and stays inside each task. Empty documents produce no
    chunks."""
    if not (0 < stride <= width):
        raise ValueError("require 0 < stride <= width")
    n = F.col(n_tok_col).cast("long")
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0).cast("long"),
        F.floor((n - width + stride - 1) / stride).cast("long"),
    )
    out = (
        df.filter(n > 0)
        .select(
            id_col,
            tokens_col,
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("start"),
            F.slice(
                F.col(tokens_col),
                (F.col("chunk_idx") * stride + 1).cast("int"),
                F.least(
                    F.lit(width).cast("long"),
                    F.col("__n") - F.col("chunk_idx") * stride,
                ).cast("int"),
            ).alias("tokens"),
            F.col("__n"),
        )
    )
    end = F.col("start") + F.size("tokens")
    prev_end = F.when(
        F.col("chunk_idx") > 0,
        F.least(F.col("__n"), (F.col("chunk_idx") - 1) * stride + width),
    ).otherwise(F.lit(0).cast("long"))
    return out.select(
        id_col,
        "chunk_idx",
        "start",
        "tokens",
        F.size("tokens").cast("long").alias("n_ctx"),
        (end - prev_end).cast("long").alias("n_new"),
    )


def unigram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-document token-distribution health signals: distinct-token
    ratio, the share of the single most frequent token (degenerate
    repetition shows up as top_share → 1), and the unigram Shannon
    entropy in bits. Entropy is computed on the micro-quantized-integer
    plan this repo uses everywhere float sums must be bit-exact across
    engines and partitionings (see lm.py): per (doc, token) the term
    ``c * round(ln(c) * 1e6)`` is an INTEGER, so the per-doc sum is
    associative-exact; the final ``H = (n*round(ln(n)*1e6) - S) /
    (n * 1e6 * ln 2)`` division happens once on identical integers.

    Plan: explode → map-side-combined (doc, token) counts → per-doc
    re-aggregate; both shuffles carry (id, token|count) pairs, never the
    arrays. Empty documents report zeros."""
    q = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")  # noqa: E731
    counts = (
        df.select(F.col(id_col).alias("__id"), F.explode(tokens_col).alias("__t"))
        .groupBy("__id", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per_doc = counts.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.max("__c").alias("__cmax"),
        F.sum(F.col("__c") * q(F.col("__c"))).alias("__s"),
    )
    n = F.col(n_tok_col).cast("long")
    ent_micro = n * q(n) - F.col("__s")
    return (
        df.select(id_col, n.alias("n_tok"))
        .join(per_doc.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            "n_tok",
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.when(n > 0, F.round(F.col("n_unique") / n, 6))
            .otherwise(F.lit(0.0))
            .alias("unique_ratio"),
            F.when(n > 0, F.round(F.col("__cmax") / n, 6))
            .otherwise(F.lit(0.0))
            .alias("top_share"),
            F.when(
                n > 0,
                F.round(
                    ent_micro.cast("double") / n / F.lit(1e6) / F.log(F.lit(2.0)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("entropy_bits"),
        )
    )


def source_kl(
    df: DataFrame,
    source_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Corpus-drift monitor: per source, the KL divergence
    ``KL(p_source ‖ p_corpus)`` between the source's unigram token
    distribution and the corpus-wide one — the signal that tells a
    mixture pipeline when one source's token statistics diverge (new
    tokenizer, corrupted shard, domain shift). Zero-smoothing is safe by
    construction: every source token also appears in the corpus
    distribution.

    Bit-exactness: KL is assembled from INTEGER terms on the
    micro-quantized-ln plan (see :func:`unigram_stats` / lm.py) —
    per (source, token): ``c_st · [(q(c_st) − q(n_s)) − (q(c_t) − q(N))]``
    with ``q(x) = round(ln(x)·1e6)`` — so the per-source sum is
    associative-exact and identical across engines/partitionings; one
    final division converts to nats.

    Plan: explode → map-side-combined (source, token) counts (≤
    |sources|·|vocab| partials); corpus token counts re-aggregate FROM
    the source counts (never a second scan); totals are a broadcast
    |sources|-row dim. The token arrays cross no shuffle."""
    q = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")  # noqa: E731
    st = (
        df.select(F.col(source_col).alias("__s"), F.explode(tokens_col).alias("__t"))
        .groupBy("__s", "__t")
        .agg(F.count(F.lit(1)).alias("__c_st"))
    )
    tot_t = st.groupBy("__t").agg(F.sum("__c_st").alias("__c_t"))
    tot_s = st.groupBy("__s").agg(F.sum("__c_st").alias("__n_s"))
    tot = st.agg(F.sum("__c_st").alias("__N"))
    terms = (
        st.join(tot_t, "__t")
        .join(F.broadcast(tot_s), "__s")
        .join(F.broadcast(tot))
        .select(
            "__s",
            "__n_s",
            (
                F.col("__c_st")
                * (
                    (q(F.col("__c_st")) - q(F.col("__n_s")))
                    - (q(F.col("__c_t")) - q(F.col("__N")))
                )
            ).alias("__term"),
        )
    )
    return (
        terms.groupBy("__s")
        .agg(F.sum("__term").alias("__kl_micro"), F.first("__n_s").alias("__n_s"))
        .select(
            F.col("__s").alias(source_col),
            F.col("__n_s").alias("n_tokens"),
            F.round(
                F.col("__kl_micro").cast("double") / F.col("__n_s") / F.lit(1e6),
                6,
            ).alias("kl_nats"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    cutoffs: list[int] | None = None,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Tokenizer-sizing curve: for each candidate vocab size ``k``, the
    share of token OCCURRENCES a top-``k``-by-frequency vocabulary would
    cover (the complement is the OOV mass a frequency-truncated
    retraining accepts). Returns (cutoff, covered, total, coverage).

    Scale shape: one map-side-combined token count (shuffle ≤ |vocab|
    partial rows per task), then ranking and cumulative sums run on the
    VOCAB DIM — bounded by the tokenizer id space (≤ a few hundred k
    rows), the same bounded-dim window budget the BPE trainer uses. The
    corpus is scanned once; cutoffs are evaluated from one ranked dim."""
    cutoffs = cutoffs or [100, 1_000, 10_000]
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "token")
    ranked = counts.withColumn("__r", F.row_number().over(w))
    cuts = F.array(*[F.lit(int(k)) for k in sorted(cutoffs)])
    per_cut = ranked.select(
        F.explode(cuts).alias("cutoff"), "__r", "n"
    ).groupBy("cutoff").agg(
        F.sum(F.when(F.col("__r") <= F.col("cutoff"), F.col("n")).otherwise(0)).alias(
            "covered"
        ),
        F.sum("n").alias("total"),
    )
    return per_cut.select(
        F.col("cutoff").cast("long").alias("cutoff"),
        "covered",
        "total",
        F.round(F.col("covered") / F.col("total"), 6).alias("coverage"),
    )


def self_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """WITHIN-document repeated-n-gram fraction over token ids — the
    token-level twin of the Gopher dup-word filters (`text.
    repetition_features`) and the within-doc complement of the
    corpus-wide :func:`dup_ngram_fraction`: share of a doc's n-gram
    occurrences whose n-gram appears at least ``min_count`` times in the
    SAME document (looped generations and boilerplate score high).

    Plan: occurrence-level int64 n-gram folds explode once; counts
    aggregate per (doc, gram) — map-side combined, shuffle carries
    (id, 8-byte hash, count) — and re-aggregate per doc. Docs shorter
    than ``n`` score 0."""
    from vector_spark.dataprep.dedup import token_ngram_hashes

    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            token_ngram_hashes(F.col(tokens_col), n, distinct=False)
        ).alias("__g"),
    )
    per_doc = (
        grams.groupBy("__id", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__id")
        .agg(
            F.sum("__c").alias("ngrams_total"),
            F.sum(F.when(F.col("__c") >= min_count, F.col("__c")).otherwise(0)).alias(
                "ngrams_rep"
            ),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("ngrams_total", F.lit(0)).alias("ngrams_total"),
            F.coalesce("ngrams_rep", F.lit(0)).alias("ngrams_rep"),
            F.when(
                F.coalesce("ngrams_total", F.lit(0)) > 0,
                F.round(F.col("ngrams_rep") / F.col("ngrams_total"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("rep_frac"),
        )
    )
