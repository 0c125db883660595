"""Text analysis over document tables: normalization, token counting,
language-ID, quality scoring, fingerprinting.

Everything is a pure JVM column expression (codegen'd, no Python), designed
so an external SQL engine can recompute identical values — the hash
primitives are md5 hex strings, the statistics are closed-form ratios.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small stopword sets per language for the n-gram/stopword language-ID
# heuristic (public common-word lists, truncated).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "不", "这", "个"],
}


def normalize(col: Column) -> Column:
    """Lowercase + collapse whitespace (the canonical dedup normalization)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(normalize(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count of maximal runs of word chars, digits,
    or single punctuation (a common fast proxy for subword token count)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"(\w+|[^\w\s])"), F.lit(1))
    )


def _stopword_hits(ws: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(ws), sw))


def lang_scores(col: Column) -> Column:
    """Distinct-stopword hit count per language → struct<en,de,fr,es,zh>."""
    ws = words(col)
    return F.struct(
        *[_stopword_hits(ws, lang).alias(lang) for lang in STOPWORDS]
    )


def lang_id(col: Column, min_hits: int = 1) -> Column:
    """Language-ID heuristic: language with the most distinct stopword hits;
    ``und`` (undetermined) when no language reaches ``min_hits``.
    Ties break by the fixed language order (deterministic)."""
    ws = words(col)
    scores = [(lang, _stopword_hits(ws, lang)) for lang in STOPWORDS]
    # fold in reverse so earlier languages win ties (>= replaces) — the
    # result is argmax with first-in-STOPWORDS-order tie-break
    expr = F.lit("und")
    best_score = F.lit(min_hits - 1)
    for lang, s in reversed(scores):
        better = (s >= F.lit(min_hits)) & (s >= best_score)
        expr = F.when(better, F.lit(lang)).otherwise(expr)
        best_score = F.when(better, s).otherwise(best_score)
    return expr


def quality_features(col: Column, ws: Column | None = None) -> Column:
    """Quality-scoring features → struct(n_chars, n_words, mean_word_len,
    punct_ratio, digit_ratio, upper_ratio, stop_ratio_en, uniq_ratio).

    All closed-form (reproducible anywhere); ratios are double.

    ``ws``: optional pre-bound words array (a materialized column or a
    :func:`vector_spark.functions.objects.let` lambda variable). The
    struct references the array ~6×; without a binding each reference
    re-tokenizes — and predicate pushdown substitutes projection aliases
    into filters, so a materialized column does NOT survive inside a
    filter predicate (use ``let`` there).
    """
    raw_len = F.length(col)
    if ws is None:
        ws = words(col)
    n_words = F.size(ws)
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    digits = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    uppers = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.struct(
        raw_len.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(F.length(F.array_join(ws, "")) / n_words, 4).alias("mean_word_len"),
        F.round(punct / raw_len, 4).alias("punct_ratio"),
        F.round(digits / raw_len, 4).alias("digit_ratio"),
        F.round(uppers / raw_len, 4).alias("upper_ratio"),
        F.round(stop_hits / n_words, 4).alias("stop_ratio_en"),
        F.round(F.size(F.array_distinct(ws)) / n_words, 4).alias("uniq_ratio"),
    )


def quality_score(col: Column, ws: Column | None = None) -> Column:
    """Composite quality score in [0,1]: length sweet-spot + lexical
    diversity + bounded punctuation/digit density. Deterministic weights."""
    f = quality_features(col, ws=ws)
    length_ok = F.when((f.n_words >= 10) & (f.n_words <= 10_000), 1.0).otherwise(0.3)
    diversity = F.least(f.uniq_ratio * 2, F.lit(1.0))
    clean = F.lit(1.0) - F.least(
        (f.punct_ratio + f.digit_ratio) * 2, F.lit(1.0)
    )
    return F.round(0.4 * length_ok + 0.3 * diversity + 0.3 * clean, 4)


_SCRIPT_RANGES = {
    # (spark/java char class, fraction field name)
    "latin": r"A-Za-z",
    "digit": r"0-9",
    "cyrillic": "Ѐ-ӿ",
    "cjk": "一-鿿",
    "arabic": "؀-ۿ",
}


def script_profile(col: Column) -> Column:
    """Unicode-script profile for multilingual corpus curation: the
    fraction of characters in each major script block (latin, digits,
    cyrillic, CJK, arabic, other) plus the count of U+FFFD replacement
    characters (``mojibake`` — the residue of a bad encoding decode; any
    nonzero count means the upstream extractor corrupted the page).

    The lang-id heuristic (:func:`lang_id`) is stopword-based and only
    meaningful for latin-script languages; this profile is the guard in
    front of it — route non-latin-majority docs past the latin stopword
    scorer instead of letting them all fall to its 'unknown'. Pure
    regexp_replace/length column math, codegen'd, no shuffle."""
    total = F.greatest(F.length(col), F.lit(1))
    fields = []
    covered = "".join(_SCRIPT_RANGES.values())
    for name, rng in _SCRIPT_RANGES.items():
        frac = F.round(
            F.length(F.regexp_replace(col, f"[^{rng}]", "")) / total, 6
        )
        fields.append((frac + F.lit(0.0)).alias(f"{name}_frac"))
    other = F.round(
        F.length(
            F.regexp_replace(col, f"[{covered}\\s]", "")
        ) / total,
        6,
    )
    fields.append((other + F.lit(0.0)).alias("other_frac"))
    fields.append(
        (F.length(col) - F.length(F.regexp_replace(col, "�", "")))
        .cast("long")
        .alias("mojibake")
    )
    return F.struct(*fields)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize(col))


# Polynomial-hash constants for char-gram hashing. B is a prime > any
# Unicode code point's low byte span; M is a prime < 2^50 so the chained
# step ``h*B + c`` stays < 2^58 — no int64 overflow under ANSI mode, and
# the identical chain is exactly representable in DuckDB BIGINT math
# (the portability contract the oracle relies on).
GRAM_HASH_BASE = 257
GRAM_HASH_MOD = 1_000_000_000_000_037


def _gram_chain(codes: Column, gp, k: int) -> Column:
    """Hash of the k-gram starting at 1-based position ``gp`` of the
    code-point array: left fold of ``h = (h*B + c) % M`` — unrolled, so
    codegen sees k multiply-adds with no per-position array allocation."""
    h = F.element_at(codes, gp)
    for j in range(1, k):
        h = (h * GRAM_HASH_BASE + F.element_at(codes, gp + j)) % GRAM_HASH_MOD
    return h


def char_codes(norm: Column) -> Column:
    """Code-point array of a string column → array<long> (one fold input
    per character; Spark ``split('')`` and DuckDB ``string_split(s,'')``
    both split on code points, so the streams agree cross-engine)."""
    return F.transform(F.split(norm, ""), lambda ch: F.ascii(ch).cast("long"))


def char_gram_hashes(norm: Column, k: int = 8) -> Column:
    """Rolling character k-gram hashes of an already-NORMALIZED string
    column → array<long>, one ~50-bit polynomial hash per position (the
    winnowing input stream). Texts shorter than ``k`` chars hash as one
    gram. The hash is a chained ``(h*B + c) % M`` over code points —
    pure int64 multiply-adds in whole-stage codegen (≈5× cheaper than the
    earlier md5-per-position scheme) and bit-exact in any engine with
    64-bit integer arithmetic (oracles.winnow_cte_sql mirrors it).

    Pass a MATERIALIZED normalized column (``withColumn("__norm",
    normalize(col))``) — an inline ``normalize`` subtree would re-run its
    regex once per character position inside the HOF lambda. The code
    array itself is bound once per row via a let-binding for the same
    reason."""
    from vector_spark.functions.objects import let

    n = F.length(norm)
    return let(
        char_codes(norm),
        lambda codes: F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda gp: _gram_chain(codes, gp, k),
            ),
        ).otherwise(
            F.array(
                F.aggregate(
                    codes,
                    F.lit(0).cast("long"),
                    lambda h, c: (h * GRAM_HASH_BASE + c) % GRAM_HASH_MOD,
                )
            )
        ),
    )


def winnow(hashes: Column, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): slide a window of ``w`` consecutive k-gram hashes and
    keep each window's minimum → sorted distinct array<long>.

    Guarantee: any shared substring of length ≥ k + w - 1 between two
    documents contributes at least one IDENTICAL selected fingerprint to
    both — so near-dup/plagiarism detection is an equi-join on exploded
    fingerprints, never a pairwise scan. Fewer than ``w`` hashes → keep
    them all. Pass a MATERIALIZED hash-array column (HOF recompute,
    same caveat as :func:`char_gram_hashes`)."""
    m = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(1), m - (w - 1)),
        # unrolled least-of-w element_ats: no per-window array allocation
        # (slice+array_min materializes a w-array per position)
        lambda j: F.least(*[F.element_at(hashes, j + i) for i in range(w)]),
    )
    return F.array_sort(
        F.array_distinct(F.when(m >= w, mins).otherwise(hashes))
    )


def winnow_fingerprints(norm: Column, k: int = 8, w: int = 4,
                        strategy: str = "pandas") -> Column:
    """Selected winnowing fingerprints of an already-NORMALIZED string
    column → sorted distinct array<long>, in one call.

    Two strategies with BIT-IDENTICAL output (same chain, same window
    minima — the SQL oracle mirrors either):

    - ``"expr"``: the pure column-expression pipeline
      (:func:`char_gram_hashes` → :func:`winnow`). HOF lambdas are
      interpreted per element, so the cost is O(n·k) expression-node
      evaluations per document.
    - ``"pandas"`` (default): vectorized numpy inside an Arrow-batched
      pandas UDF — the same ``h = (h*B + c) % M`` chain evaluated as k
      shifted whole-array passes and the window minimum as w shifted
      ``np.minimum`` passes, so per-document Python cost is ~k+w numpy
      calls, not n·k interpreted nodes (~6× faster on the synth corpus).
      All intermediates stay < 2^58, inside int64 — no overflow, exact
      parity with the JVM/DuckDB integer chain.
    """
    if strategy == "expr":
        from vector_spark.functions.objects import let

        return let(char_gram_hashes(norm, k=k), lambda h: winnow(h, w=w))
    if strategy != "pandas":
        raise ValueError(f"unknown winnow strategy: {strategy!r}")

    from pyspark.sql.functions import pandas_udf

    B, M = GRAM_HASH_BASE, GRAM_HASH_MOD

    @pandas_udf("array<long>")
    def _winnow_np(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            # utf-32-le frombuffer == code-point stream == F.ascii over
            # split("") — the exact fold input of the expr strategy.
            codes = np.frombuffer(
                t.encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            n = codes.size
            if n < k:
                h = 0
                for c in codes:  # < k iterations, short-text tail only
                    h = (h * B + int(c)) % M
                out.append([h])
                continue
            npos = n - k + 1
            hashes = np.zeros(npos, dtype=np.int64)
            for j in range(k):
                hashes = (hashes * B + codes[j : j + npos]) % M
            if npos < w:
                mins = hashes
            else:
                nw = npos - w + 1
                mins = hashes[:nw].copy()
                for i in range(1, w):
                    np.minimum(mins, hashes[i : i + nw], out=mins)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return _winnow_np(norm)


def winnow_digest(fp: Column) -> Column:
    """md5 digest of a fingerprint array (engine-portable string form for
    exact comparison — array columns defeat the driver canonicalizer)."""
    return F.md5(
        F.array_join(F.transform(fp, lambda x: x.cast("string")), ",")
    )


def _word_ngrams(ws: Column, n: int) -> Column:
    """Word n-grams of an already-tokenized array (space-joined strings).
    Documents shorter than ``n`` words yield an empty array (``F.sequence``
    would otherwise count DOWN from 0 and emit garbage grams)."""
    if n == 1:
        return ws
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_run(sorted_grams: Column) -> Column:
    """Longest equal-run length of an already-SORTED gram array — one
    O(n) ``aggregate`` fold, every subexpression referenced once.
    Works for any element type; the initial NULL sentinel never equals a
    real element, so the first element starts a run of 1."""
    return F.aggregate(
        sorted_grams,
        F.struct(
            F.lit(None).cast("long").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _top_ngram_frac(ws: Column, n: int) -> Column:
    """Fraction of n-gram occurrences taken by the single most frequent
    n-gram (the Gopher repetition signal).

    Shape matters: the obvious ``transform(distinct(g), x -> count in g)``
    embeds the gram-list subtree inside both lambdas, and Spark re-evaluates
    it per element — O(n³) per document (measured: hung a 5000-doc scan for
    minutes). Instead sort once and take the longest equal-run with a
    single O(n) ``aggregate`` fold.

    Deliberately a pure Column expression (materializing the gram arrays
    as projection columns was MEASURED SLOWER — 29 s → 60 s on the sf0.1
    curation pipeline: carrying per-doc string arrays through row buffers
    costs more than recomputing them, and filter-predicate pushdown
    re-inlines the subtree anyway). Two further shape choices:

    - grams are hashed to int64 (``xxhash64``) BEFORE the sort — only
      equal-gram GROUPING matters for the top run, not lexicographic
      order, so sorting/comparing longs replaces string allocation +
      comparison in the fold (same fraction; a same-doc 64-bit collision
      is ~m²/2⁶⁴).
    - the denominator is closed-form (``size(ws)-n+1``), not a second
      evaluation of the gram subtree — the subtree is evaluated once."""
    grams = F.array_sort(
        F.transform(_word_ngrams(ws, n), lambda g: F.xxhash64(g))
    )
    n_grams = F.size(ws) - (n - 1)  # == size(_word_ngrams) when ≥ n words
    top = _top_run(grams)
    return F.when(
        n_grams > 0, F.round(top / n_grams, 4)
    ).otherwise(F.lit(0.0))


def repetition_features(col: Column, ws: Column | None = None) -> Column:
    """Gopher-style repetition signals (Rae et al. 2021, public thresholds)
    → struct(dup_word_frac, top_bigram_frac, top_trigram_frac, rep_ok).

    ``rep_ok`` applies the published cutoffs: top 2-gram ≤ 0.20,
    top 3-gram ≤ 0.18, duplicated-word fraction ≤ 0.70. Pure column
    expressions — no shuffle, no Python.

    For anything beyond a small scan, pass ``ws`` = a MATERIALIZED
    words-array column (``df.withColumn("__ws", words(col))``): an inline
    tokenization subtree is re-evaluated inside every HOF lambda element
    — regex + split per gram, measured 4× slower at 5000 docs."""
    if ws is None:
        ws = words(col)
    dup_word = F.round(
        F.lit(1.0) - F.size(F.array_distinct(ws)) / F.size(ws), 4
    )
    top2 = _top_ngram_frac(ws, 2)
    top3 = _top_ngram_frac(ws, 3)
    return F.struct(
        dup_word.alias("dup_word_frac"),
        top2.alias("top_bigram_frac"),
        top3.alias("top_trigram_frac"),
        ((top2 <= 0.20) & (top3 <= 0.18) & (dup_word <= 0.70)).alias("rep_ok"),
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Sliding-window document chunking (the RAG/embedding prep step):
    fixed-size character windows stepping ``chunk_chars - overlap``, one
    row per chunk with a stable ``chunk_id`` (``<doc_id>#<index>``), the
    char offset, and the chunk text. Documents shorter than one window
    yield exactly one chunk; otherwise the last window starts at the
    smallest step multiple that still reaches the end of the text, so
    every character is covered and no degenerate sub-overlap tail chunk
    is emitted (its text may be shorter than ``chunk_chars`` by up to
    ``step - 1``).

    Scale shape: pure per-row explode — a ``sequence`` of offsets
    (bounded by doc length / step) transformed to substrings, no
    shuffle, no Python; chunk count per doc is ceil(len/step), so
    output volume ≈ input volume × (1 + overlap/step)."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    n = F.greatest(F.length(F.col(text_col)), F.lit(1))
    last = (
        F.when(n <= chunk_chars, F.lit(0))
        .otherwise(
            F.ceil((n - F.lit(chunk_chars)) / F.lit(step)).cast("int")
            * F.lit(step)
        )
    )
    starts = F.sequence(F.lit(0), last, F.lit(step))
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
        F.posexplode(starts).alias("chunk_index", "char_start"),
    )
    return exploded.select(
        F.concat(
            F.col("__id").cast("string"), F.lit("#"),
            F.col("chunk_index").cast("string"),
        ).alias("chunk_id"),
        F.col("__id").alias(id_col),
        "chunk_index",
        "char_start",
        F.substring(
            F.col("__txt"), F.col("char_start") + 1, chunk_chars
        ).alias("chunk_text"),
    )


def quality_percentile_filter(
    df: DataFrame,
    keep_frac: float,
    score_col: str = "quality",
    group_col: str = "source",
    id_col: str = "doc_id",
    decimals: int = 4,
) -> DataFrame:
    """Keep the top ``keep_frac`` of each group by score — the RELATIVE
    quality threshold ("best 30% of every source") that absolute-cutoff
    filters can't express when sources have different score
    distributions.

    Ranking is exact and deterministic: scores quantize to ``decimals``
    places first (float rank ties are engine-portable only after
    rounding), ties break by id. A row is kept when its 1-based rank ≤
    ceil(keep_frac · group size).

    Scale shape: the rank is two-phase over VALUE buckets (the quantized
    score IS the bucket) — per-(group, bucket) counts form a broadcast
    offsets dim (≤ groups × distinct-quantized-scores rows, bounded by
    10^decimals), and only within-bucket windows touch data rows; hot
    groups never funnel through one task. The degenerate case (all mass
    on one score value) degrades to one window per group-bucket — the
    same bound an absolute filter would hit."""
    from pyspark.sql import Window

    if not 0 < keep_frac <= 1:
        raise ValueError("keep_frac must be in (0, 1]")
    q = F.round(F.col(score_col), decimals).alias("__q")
    d = df.withColumn("__q", q)
    counts = d.groupBy(group_col, "__q").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__q").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        group_col,
        "__q",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__n").over(
            Window.partitionBy(group_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    w_in = Window.partitionBy(group_col, "__q").orderBy(id_col)
    return (
        d.join(F.broadcast(offsets), [group_col, "__q"])
        .withColumn(
            "__rank", F.col("__off") + F.row_number().over(w_in)
        )
        .filter(
            F.col("__rank") <= F.ceil(F.col("__total") * F.lit(keep_frac))
        )
        .drop("__q", "__off", "__total", "__rank")
    )
