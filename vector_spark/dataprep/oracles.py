"""DuckDB SQL mirrors of the dataprep operators — the cross-engine spec.

Each builder returns SQL computing bit-identical results to the matching
Spark operator (same md5-hex hash family, same normalization, same
rounding), so the correctness gate can verify dedup/similarity/text ops
exactly rather than rows-only.
"""

from __future__ import annotations

from vector_spark.dataprep.text import STOPWORDS

NORM = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
WORDS = f"string_split({NORM}, ' ')"


def words_expr(col: str = "text") -> str:
    return WORDS.format(col=col)


def shingles_expr(col: str = "text", k: int = 3) -> str:
    ws = words_expr(col)
    return (
        f"list_sort(list_distinct(list_transform("
        f"range(1, greatest(len({ws}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({ws}, i, i + {k - 1}), ' '))))"
    )


def minhash_sig_exprs(sh: str, num_hashes: int) -> list[str]:
    return [
        f"list_min(list_transform({sh}, s -> md5('{i}~' || s)))"
        for i in range(num_hashes)
    ]


# int64 hash-family mirrors (dedup.py fast path): ONE md5 per shingle,
# affine permutations over the 2^31-1 prime field.

_HASH64 = (
    "list_sum(list_transform(range(1, 16), i -> "
    "(strpos('0123456789abcdef', md5({s})[i:i]) - 1)::BIGINT "
    "<< (4 * (15 - i))))::BIGINT"
)


def hash64_expr(s: str) -> str:
    """First 15 hex nibbles of md5 → 60-bit BIGINT (≙ dedup.shingle_hash64)."""
    return _HASH64.format(s=s)


def hashed_shingles_expr(col: str = "text", k: int = 3) -> str:
    return (
        f"list_sort(list_distinct(list_transform({shingles_expr(col, k)}, "
        f"s -> {hash64_expr('s')})))"
    )


def minhash_sig_int_exprs(hsh: str, num_hashes: int) -> list[str]:
    from vector_spark.dataprep.dedup import MINHASH_PRIME, affine_coeffs

    m = MINHASH_PRIME
    return [
        f"list_min(list_transform({hsh}, h -> ((h % {m}) * {a} + {b}) % {m}))"
        for a, b in affine_coeffs(num_hashes)
    ]


def band_keys_expr(sig_items: list[str], bands: int, rows_per_band: int) -> str:
    keys = []
    for b in range(bands):
        sl = [f"({x})::VARCHAR" for x in sig_items[b * rows_per_band : (b + 1) * rows_per_band]]
        joined = " || '|' || ".join(sl)
        keys.append(f"md5('b{b}~' || {joined})")
    return "list_value(" + ", ".join(keys) + ")"


def token_ngram_hashes_expr(
    col: str = "tokens", n: int = 8, distinct: bool = True
) -> str:
    """≙ dedup.token_ngram_hashes: polynomial fold of each length-n token
    window mod MINHASH_PRIME. DuckDB's list_reduce seeds with the first
    element, which equals Spark's 0-seeded aggregate because 0·p+t₁ = t₁
    (every token < MINHASH_PRIME, so the skipped first mod is a no-op).
    ``distinct=False`` keeps occurrence multiplicity (≙ the Spark arg)."""
    from vector_spark.dataprep.dedup import MINHASH_PRIME

    grams = (
        f"list_transform(range(1, len({col}) - {n} + 2), "
        f"i -> list_reduce(({col}[i:i+{n}-1])::BIGINT[], "
        f"(acc, t) -> (acc * 1000003 + t) % {MINHASH_PRIME}))"
    )
    if distinct:
        grams = f"list_sort(list_distinct({grams}))"
    return f"CASE WHEN len({col}) >= {n} THEN {grams} ELSE []::BIGINT[] END"


def minhash_near_dups_sql(
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
    table: str = "documents",
    id_col: str = "doc_id",
    shingle_expr: str | None = None,
    extra_cte: str | None = None,
) -> str:
    rows_per_band = num_hashes // bands
    sh = shingle_expr or hashed_shingles_expr("text", k_shingle)
    sig = minhash_sig_int_exprs("__sh", num_hashes)
    bands_e = band_keys_expr(sig, bands, rows_per_band)
    pre = f"{extra_cte}," if extra_cte else ""
    return f"""
    WITH {pre} base AS (
      SELECT {id_col} AS __id, {sh} AS __sh FROM {table}
    ), withbands AS (
      SELECT __id, __sh, {bands_e} AS __bands FROM base
    ), banded AS (
      SELECT __id, __sh, b.bi AS __b, list_extract(__bands, b.bi + 1) AS __key
      FROM withbands, range({bands}) b(bi)
    ), pairs AS (
      SELECT DISTINCT l.__id AS id_a, r.__id AS id_b
      FROM banded l JOIN banded r
        ON l.__b = r.__b AND l.__key = r.__key AND l.__id < r.__id
    ), verified AS (
      SELECT p.id_a, p.id_b,
             ROUND(len(list_intersect(a.__sh, b.__sh))::DOUBLE /
                   (len(a.__sh) + len(b.__sh) - len(list_intersect(a.__sh, b.__sh))), 4)
               AS jaccard
      FROM pairs p
      JOIN base a ON a.__id = p.id_a
      JOIN base b ON b.__id = p.id_b
    )
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}
    """


def lang_scores_exprs(col: str = "text") -> dict[str, str]:
    ws = words_expr(col)
    out = {}
    for lang, sw in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in sw)
        out[lang] = f"len(list_intersect(list_distinct({ws}), [{lst}]))"
    return out


def ngrams_expr(col: str = "text", n: int = 2) -> str:
    """Non-distinct word n-gram list (empty when the doc has < n words)."""
    ws = words_expr(col)
    return (
        f"list_transform(range(1, greatest(len({ws}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({ws}, i, i + {n - 1}), ' '))"
    )


def top_ngram_frac_on(list_col: str) -> str:
    """top-n-gram fraction over an ALREADY-MATERIALIZED gram-list column.
    Always reference a ``MATERIALIZED`` CTE column here — inlining the
    full n-gram expression makes DuckDB recompute it inside every lambda
    evaluation (measured 160 s vs <1 s for 500 docs)."""
    g = list_col
    return (
        f"CASE WHEN len({g}) > 0 THEN "
        f"round(list_max(list_transform(list_distinct({g}), "
        f"x -> len(list_filter({g}, y -> y = x)))) / len({g}), 4) "
        f"ELSE 0.0 END"
    )


def top_ngram_frac_expr(col: str = "text", n: int = 2) -> str:
    """Fraction of n-gram occurrences held by the most frequent n-gram
    (mirrors text.repetition_features). Prefer :func:`top_ngram_frac_on`
    over a materialized CTE column for anything bigger than a handful of
    rows (see its note)."""
    return top_ngram_frac_on(ngrams_expr(col, n))


def dup_word_frac_expr(col: str = "text") -> str:
    ws = words_expr(col)
    return f"round(1.0 - len(list_distinct({ws})) / len({ws}), 4)"


def lang_id_sql_expr(col: str = "text", min_hits: int = 1) -> str:
    s = lang_scores_exprs(col)
    langs = list(STOPWORDS)
    m = "greatest(" + ", ".join(s[lang] for lang in langs) + ")"
    case = f"CASE WHEN {m} < {min_hits} THEN 'und' "
    for lang in langs:
        case += f"WHEN {s[lang]} = {m} THEN '{lang}' "
    return case + "END"


def quality_sql_exprs(col: str = "text") -> dict[str, str]:
    ws = words_expr(col)
    sw_en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_words = f"len({ws})"
    punct_ratio = (
        f"ROUND(length(regexp_replace({col}, '[^.,;:!?''\"()\\[\\]{{}}-]', '', 'g'))::DOUBLE"
        f" / length({col}), 4)"
    )
    digit_ratio = (
        f"ROUND(length(regexp_replace({col}, '[^0-9]', '', 'g'))::DOUBLE"
        f" / length({col}), 4)"
    )
    uniq_ratio = f"ROUND(len(list_distinct({ws}))::DOUBLE / {n_words}, 4)"
    stop_ratio = (
        f"ROUND(len(list_filter({ws}, w -> list_contains([{sw_en}], w)))::DOUBLE"
        f" / {n_words}, 4)"
    )
    mean_word_len = (
        f"ROUND(length(array_to_string({ws}, ''))::DOUBLE / {n_words}, 4)"
    )
    return {
        "n_chars": f"length({col})",
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "uniq_ratio": uniq_ratio,
        "stop_ratio_en": stop_ratio,
    }


def quality_score_sql_expr(col: str = "text") -> str:
    f = quality_sql_exprs(col)
    length_ok = f"CASE WHEN {f['n_words']} >= 10 AND {f['n_words']} <= 10000 THEN 1.0 ELSE 0.3 END"
    diversity = f"least({f['uniq_ratio']} * 2, 1.0)"
    clean = f"1.0 - least(({f['punct_ratio']} + {f['digit_ratio']}) * 2, 1.0)"
    return f"ROUND(0.4 * ({length_ok}) + 0.3 * ({diversity}) + 0.3 * ({clean}), 4)"


def simhash_sql_expr(col: str = "text", bits: int = 16) -> str:
    ws = words_expr(col)
    hashed = f"list_transform(list_distinct({ws}), w -> md5(w))"
    nib = (
        "list_sum(list_transform({h}, h -> "
        "(strpos('0123456789abcdef', h[{p}:{p}]) - 1) * 2 - 15))"
    )
    parts = []
    for p in range(1, bits + 1):
        s = nib.format(h=hashed, p=p)
        parts.append(f"CASE WHEN {s} > 0 THEN 'f' ELSE '0' END")
    return " || ".join(parts)


# --- sign-LSH mirrors (similarity.py) --------------------------------------
# The planes are deterministic literal ±1 arrays, so the "approximate" LSH
# output is closed-form and exactly reproducible in SQL: same bucket ids,
# same candidate pairs, same verified cosines.


def projection_sql(seed: int, dim: int) -> str:
    from vector_spark.dataprep.similarity import _projection_vector

    return "[" + ", ".join(str(v) for v in _projection_vector(seed, dim)) + "]"


def sign_lsh_bucket_sql(vexpr: str, dim: int, planes: int, seed0: int = 1) -> str:
    """bucket = Σ bit_p · 2^(planes-1-p), bit_p = dot(v, plane_p) > 0 —
    mirrors similarity.sign_lsh_bucket's MSB-first fold."""
    terms = []
    for p in range(planes):
        lit = projection_sql(seed0 + p, dim)
        w = 2 ** (planes - 1 - p)
        terms.append(
            f"(CASE WHEN list_dot_product({vexpr}, {lit}) > 0 "
            f"THEN {w} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


COSINE_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def lsh_near_dups_sql(
    corpus_cte: str,
    dim: int,
    threshold: float,
    planes: int,
    plane_sets: int = 1,
) -> str:
    """Mirror of similarity.embedding_near_dups_lsh over a corpus CTE that
    must expose (vec_id, v DOUBLE[])."""
    buckets = ", ".join(
        f"{sign_lsh_bucket_sql('v', dim, planes, 1 + s * planes)} AS bkt{s}"
        for s in range(plane_sets)
    )
    unions = "\n          UNION ALL\n".join(
        f"          SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        f"FROM bkt a JOIN bkt b ON a.bkt{s} = b.bkt{s} AND a.vec_id < b.vec_id"
        for s in range(plane_sets)
    )
    cos = COSINE_SQL.format(a="va.v", b="vb.v")
    return f"""
        WITH corpus AS ({corpus_cte}),
        bkt AS (SELECT vec_id, v, {buckets} FROM corpus),
        cand AS (SELECT DISTINCT id_a, id_b FROM (
{unions}
        )),
        verified AS (
          SELECT c.id_a, c.id_b, ROUND({cos}, 6) AS cosine
          FROM cand c
          JOIN corpus va ON va.vec_id = c.id_a
          JOIN corpus vb ON vb.vec_id = c.id_b
        )
        SELECT id_a, id_b, cosine FROM verified WHERE cosine >= {threshold}
    """


def planted_corpus_sql(
    table: str = "embeddings",
    dim: int = 64,
    id_cap: int = 500,
    every: int = 5,
    eps: float = 0.04,
    perturb_seed: int = 991,
    id_offset: int = 100_000,
) -> str:
    """Mirror of similarity.planted_near_dup_corpus (subsampled corpus with
    deterministic planted near-duplicates)."""
    u = projection_sql(perturb_seed, dim)
    return f"""
          SELECT vec_id, embedding::DOUBLE[] AS v
          FROM {table} WHERE vec_id < {id_cap}
          UNION ALL
          SELECT vec_id + {id_offset},
                 list_transform(generate_series(1, {dim}),
                   i -> e.embedding[i]::DOUBLE
                        + ({eps}::DOUBLE * sqrt(list_dot_product(
                            e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
                          * ({u}::DOUBLE[])[i]) AS v
          FROM {table} e WHERE vec_id < {id_cap} AND vec_id % {every} = 0
    """


def lsh_recall_sql(
    corpus_cte: str,
    dim: int,
    threshold: float = 0.9,
    planes: int = 4,
    plane_sets: int = 3,
    min_recall: float = 0.9,
) -> str:
    """Mirror of similarity.lsh_recall_summary: exact pairs vs LSH-found
    pairs on the same corpus → one (n_exact, n_recalled, recall,
    meets_bound) row."""
    lsh = lsh_near_dups_sql(corpus_cte, dim, threshold, planes, plane_sets)
    cos = COSINE_SQL.format(a="a.v", b="b.v")
    return f"""
        WITH corpus AS ({corpus_cte}),
        exact AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
          WHERE ROUND({cos}, 6) >= {threshold}
        ),
        lsh AS ({lsh}),
        hits AS (
          SELECT e.id_a, e.id_b FROM exact e
          WHERE EXISTS (SELECT 1 FROM lsh l
                        WHERE l.id_a = e.id_a AND l.id_b = e.id_b)
        )
        SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
               (SELECT COUNT(*) FROM hits) AS n_recalled,
               ROUND((SELECT COUNT(*) FROM hits)::DOUBLE /
                     (SELECT COUNT(*) FROM exact), 4) AS recall,
               (SELECT COUNT(*) FROM hits)::DOUBLE /
                     (SELECT COUNT(*) FROM exact) >= {min_recall} AS meets_bound
    """


def winnow_cte_sql(
    col: str = "text", k: int = 8, w: int = 4, table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """CTE block mirroring text.char_gram_hashes + text.winnow → a
    ``winnowed({id_col}, fp BIGINT[])`` relation. Every list is hoisted
    into a MATERIALIZED CTE — an inline list expr inside a lambda is
    re-evaluated per element (the O(n³) DuckDB trap).

    Gram hashing is the polynomial chain ``(h*B + c) % M`` over code
    points (text.GRAM_HASH_BASE/MOD): pure BIGINT math, bit-exact across
    engines. ``list_reduce`` seeds with the first element — identical to
    Spark's explicit ``h = codes[gp]`` seed because ``(0*B + c1) % M ==
    c1`` for any code point < M."""
    norm = NORM.format(col=col)
    from vector_spark.dataprep.text import GRAM_HASH_BASE as B
    from vector_spark.dataprep.text import GRAM_HASH_MOD as M

    step = f"(h * {B} + c) % {M}"
    gram = (
        f"list_reduce(list_slice(cp, gp, gp + {k - 1}), "
        f"(h, c) -> {step})"
    )
    return f"""
        base AS MATERIALIZED (
          SELECT {id_col}, {norm} AS s FROM {table}
        ),
        coded AS MATERIALIZED (
          SELECT {id_col}, len(s) AS n,
                 list_transform(string_split(s, ''),
                                ch -> ascii(ch)::BIGINT) AS cp
          FROM base
        ),
        hashed AS MATERIALIZED (
          SELECT {id_col},
                 CASE WHEN n >= {k}
                      THEN list_transform(range(1, n - {k} + 2),
                                          gp -> {gram})
                      ELSE [list_reduce(cp, (h, c) -> {step})]
                 END AS h
          FROM coded
        ),
        winnowed AS MATERIALIZED (
          SELECT {id_col},
                 CASE WHEN len(h) >= {w}
                      THEN list_sort(list_distinct(
                             list_transform(range(1, len(h) - {w} + 2),
                               j -> list_min(list_slice(h, j, j + {w} - 1)))))
                      ELSE list_sort(list_distinct(h))
                 END AS fp
          FROM hashed
        )"""


def winnow_sql(
    col: str = "text", k: int = 8, w: int = 4, table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """Mirror of the per-document winnowing fingerprint count + digest."""
    cte = winnow_cte_sql(col, k, w, table, id_col)
    return f"""
        WITH {cte}
        SELECT {id_col},
               len(fp)::BIGINT AS n_fp,
               md5(array_to_string(list_transform(fp, x -> x::VARCHAR), ','))
                 AS fp_digest
        FROM winnowed
    """


def winnow_near_dups_sql(
    col: str = "text", k: int = 16, w: int = 8, min_shared: int = 8,
    fp_cap: int = 50, table: str = "documents", id_col: str = "doc_id",
) -> str:
    """Mirror of dedup.winnow_near_dups: explode fingerprints, drop
    stop-fingerprints (> fp_cap docs), equi-join pairs, count shared."""
    cte = winnow_cte_sql(col, k, w, table, id_col)
    return f"""
        WITH {cte},
        fps AS MATERIALIZED (
          SELECT {id_col} AS id, unnest(fp) AS fp FROM winnowed
        ),
        keep AS (
          SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {fp_cap}
        ),
        pruned AS (SELECT f.id, f.fp FROM fps f JOIN keep USING (fp))
        SELECT l.id AS id_a, r.id AS id_b, COUNT(*)::BIGINT AS shared
        FROM pruned l JOIN pruned r ON l.fp = r.fp AND l.id < r.id
        GROUP BY l.id, r.id
        HAVING COUNT(*) >= {min_shared}
    """


def ivf_cells_sql(
    corpus_cte: str, n_cells: int, nprobe: int, query_cap: int = 5,
) -> str:
    """Shared CTE block for the IVF oracles over a corpus CTE exposing
    (vec_id, v DOUBLE[]): sampled centroids (the ``n_cells`` smallest
    ids, copied verbatim), nearest-cell assignment (max dot, ties → lower
    cell — mirrors array_position-first-max), and per-query top-``nprobe``
    probe cells."""
    return f"""
        corpus AS MATERIALIZED ({corpus_cte}),
        cent AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM corpus QUALIFY row_number() OVER (ORDER BY vec_id) <= {n_cells}
        ),
        assigned AS (
          SELECT c.vec_id, c.v, ct.cell
          FROM corpus c CROSS JOIN cent ct
          QUALIFY row_number() OVER (PARTITION BY c.vec_id
                  ORDER BY list_dot_product(c.v, ct.cv) DESC, ct.cell) = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM corpus
              WHERE vec_id < {query_cap}),
        probes AS (
          SELECT q.query_id, q.qv, ct.cell
          FROM q CROSS JOIN cent ct
          QUALIFY row_number() OVER (PARTITION BY q.query_id
                  ORDER BY list_dot_product(q.qv, ct.cv) DESC, ct.cell)
                  <= {nprobe}
        )"""


def ivf_topk_sql(
    corpus_cte: str, n_cells: int = 8, nprobe: int = 2, k: int = 3,
    query_cap: int = 5,
) -> str:
    """Mirror of ivf.ivf_topk (sampled centroids)."""
    cells = ivf_cells_sql(corpus_cte, n_cells, nprobe, query_cap)
    cos = COSINE_SQL.format(a="a.v", b="p.qv")
    return f"""
        WITH {cells},
        scored AS (
          SELECT p.query_id, a.vec_id, ROUND({cos}, 6) AS cosine
          FROM assigned a JOIN probes p USING (cell)
        )
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def ivf_recall_sql(
    corpus_cte: str, n_cells: int = 8, nprobe: int = 2, k: int = 3,
    query_cap: int = 5, min_recall: float = 0.8,
) -> str:
    """Mirror of ivf.ivf_recall_summary: IVF top-k vs brute-force top-k →
    one (n_exact, n_recalled, recall, meets_bound) row."""
    cells = ivf_cells_sql(corpus_cte, n_cells, nprobe, query_cap)
    icos = COSINE_SQL.format(a="a.v", b="p.qv")
    cos = COSINE_SQL.format(a="c.v", b="q.qv")
    return f"""
        WITH {cells},
        exact AS (
          SELECT q.query_id, c.vec_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ROUND({cos}, 6) DESC, c.vec_id) AS rank
          FROM corpus c CROSS JOIN q
          QUALIFY rank <= {k}
        ),
        scored AS (
          SELECT p.query_id, a.vec_id, ROUND({icos}, 6) AS cosine
          FROM assigned a JOIN probes p USING (cell)
        ),
        ivf AS (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rank
          FROM scored
          QUALIFY rank <= {k}
        ),
        hits AS (
          SELECT e.query_id, e.vec_id FROM exact e
          WHERE EXISTS (SELECT 1 FROM ivf i
                        WHERE i.query_id = e.query_id
                          AND i.vec_id = e.vec_id)
        )
        SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
               (SELECT COUNT(*) FROM hits) AS n_recalled,
               ROUND((SELECT COUNT(*) FROM hits)::DOUBLE /
                     (SELECT COUNT(*) FROM exact), 4) AS recall,
               (SELECT COUNT(*) FROM hits)::DOUBLE /
                     (SELECT COUNT(*) FROM exact) >= {min_recall}
                 AS meets_bound
    """


def paragraph_dedup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
) -> str:
    """≙ dedup.paragraph_dedup: fixed-width segments, corpus-wide
    keep-first by md5(segment) in (id, pos) order, reassemble + digest."""
    k = seg_words
    return f"""
    WITH base AS (
      SELECT {id_col} AS id, str_split({text_col}, ' ') AS w FROM {table}
    ), chunked AS (
      SELECT id,
             list_transform(range(((len(w) + {k} - 1) // {k})::BIGINT),
               i -> array_to_string(w[(i*{k}+1):(i*{k}+{k})], ' ')) AS chunks
      FROM base
    ), seg AS (
      SELECT id, unnest(range(len(chunks))) AS pos, unnest(chunks) AS seg
      FROM chunked
    ), ranked AS (
      SELECT id, pos, seg,
             ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY id, pos) AS rk
      FROM seg
    )
    SELECT id AS {id_col},
           COUNT(*) AS n_segs,
           COUNT(*) FILTER (WHERE rk = 1) AS n_kept,
           CASE WHEN COUNT(*) FILTER (WHERE rk = 1) > 0
                THEN md5(string_agg(seg, ' ' ORDER BY pos)
                         FILTER (WHERE rk = 1))
                END AS text_digest
    FROM ranked GROUP BY id
    """


def hash_threshold_mixture_sql(
    table: str = "documents",
    total: int = 200,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> str:
    """≙ mixing.hash_threshold_mixture (temperature path): per-source
    keep probability from observed counts, 60-bit md5 hash threshold.
    ROUND(p, 12) pins the double across engines before the threshold
    multiply, so membership is bit-identical."""
    h = hash64_expr(f"{key_col}::VARCHAR")
    return f"""
    WITH c AS (
      SELECT {source_col} AS src, COUNT(*)::DOUBLE AS n
      FROM {table} GROUP BY 1
    ), d AS (
      SELECT src, n, POWER(n, {alpha}) AS w FROM c
    ), p AS (
      SELECT src,
             CAST(ROUND(least(1.0, {total} * w / (SUM(w) OVER () * n)), 12)
                  * 1152921504606846976.0 AS BIGINT) AS thr
      FROM d
    )
    SELECT t.{key_col}, t.{source_col}
    FROM {table} t JOIN p ON t.{source_col} = p.src
    WHERE {h} < p.thr
    """


def token_substring_dedup_sql(seq_sql: str, k: int = 50) -> str:
    """≙ substring.token_substring_dedup over the closed-form sequences
    table: per-position double polynomial k-gram hashes, corpus-wide
    keep-first in (doc_id, position) order, interval-union coverage
    islands, indexed-filter reassembly + digest. All integer math —
    bit-exact across engines (DuckDB's lambda index is 1-based, matching
    the 1-based positions the Spark side derives from posexplode+1)."""
    from vector_spark.dataprep.substring import (
        TOKEN_HASH_BASE_1,
        TOKEN_HASH_BASE_2,
        TOKEN_HASH_MOD_1,
        TOKEN_HASH_MOD_2,
    )

    gram1 = (
        f"list_reduce(lt[gp : gp + {k - 1}], "
        f"(h, c) -> (h * {TOKEN_HASH_BASE_1} + c) % {TOKEN_HASH_MOD_1})"
    )
    gram2 = (
        f"list_reduce(lt[gp : gp + {k - 1}], "
        f"(h, c) -> (h * {TOKEN_HASH_BASE_2} + c) % {TOKEN_HASH_MOD_2})"
    )
    return f"""
    WITH seq AS ({seq_sql}),
    base AS MATERIALIZED (
      SELECT doc_id, list_transform(tokens, t -> t::BIGINT) AS lt,
             len(tokens) AS n
      FROM seq
    ),
    occ AS MATERIALIZED (
      SELECT doc_id, gp, {gram1} AS h1, {gram2} AS h2
      FROM base, LATERAL unnest(range(1, greatest(n - {k} + 2, 1))) AS t(gp)
    ),
    dups AS (
      SELECT doc_id, q, q + {k} - 1 AS e FROM (
        SELECT doc_id, gp AS q,
               ROW_NUMBER() OVER (PARTITION BY h1, h2
                                  ORDER BY doc_id, gp) AS rk
        FROM occ
      ) WHERE rk > 1
    ),
    isl AS (
      SELECT doc_id, q, e,
             CASE WHEN q > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775807) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM dups
    ),
    merged AS (
      SELECT doc_id, iid, min(q) AS s, max(e) AS e, count(*) AS n_occ
      FROM (
        SELECT doc_id, q, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
        FROM isl
      ) GROUP BY doc_id, iid
    ),
    cover AS (
      SELECT doc_id,
             list({{'s': s, 'e': e}} ORDER BY s) AS islands,
             sum(e - s + 1) AS n_cut,
             sum(n_occ) AS n_dup_grams
      FROM merged GROUP BY doc_id
    ),
    kept AS (
      SELECT b.doc_id, b.n,
             coalesce(c.n_dup_grams, 0) AS n_dup_grams,
             coalesce(c.n_cut, 0) AS n_cut,
             list_filter(b.lt, (tok, i) ->
               NOT len(list_filter(
                 coalesce(c.islands, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
                 p -> p.s <= i AND i <= p.e)) > 0) AS kt
      FROM base b LEFT JOIN cover c USING (doc_id)
    )
    SELECT doc_id,
           n::BIGINT AS n_tok,
           greatest(n - {k} + 1, 0)::BIGINT AS n_grams,
           n_dup_grams::BIGINT AS n_dup_grams,
           n_cut::BIGINT AS n_cut,
           (n - n_cut)::BIGINT AS n_kept,
           CASE WHEN len(kt) > 0
                THEN md5(array_to_string(
                       list_transform(kt, x -> x::VARCHAR), ','))
                END AS kept_digest
    FROM kept
    """


def pq_cte_sql(
    corpus_cte: str, m: int = 4, ksub: int = 8, dim: int = 64,
    query_cap: int = 5,
) -> str:
    """Shared CTE block for the PQ oracles over a corpus CTE exposing
    (vec_id, v DOUBLE[]): codebooks are slices of the ``ksub``
    smallest-id corpus vectors (copied verbatim — no arithmetic, same
    trick as ivf_cells_sql), each vector is encoded per subspace by
    argmin micro-unit squared L2 (ties -> lower codeword), and queries
    (vec_id < query_cap) get per-(subspace, codeword) ADC distance rows.
    All distances use the expression shape of pq._dists_u:
    ``round(((self(a) - 2*dot(a,c)) + self(c)) * 1e6)::BIGINT``."""
    dsub = dim // m
    d_expr = (
        "ROUND(((list_dot_product(sub, sub)"
        " - 2.0 * list_dot_product(sub, b.cv))"
        " + list_dot_product(b.cv, b.cv)) * 1000000)::BIGINT"
    )
    return f"""
        corpus AS MATERIALIZED ({corpus_cte}),
        cbase AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw, v
          FROM corpus QUALIFY row_number() OVER (ORDER BY vec_id) <= {ksub}
        ),
        cb AS MATERIALIZED (
          SELECT s.s, c.cw,
                 list_slice(c.v, s.s*{dsub}+1, s.s*{dsub}+{dsub}) AS cv
          FROM cbase c CROSS JOIN (SELECT unnest(range({m})) AS s) s
        ),
        codes AS MATERIALIZED (
          SELECT vec_id, s, cw AS code FROM (
            SELECT c.vec_id, b.s, b.cw,
                   list_slice(c.v, b.s*{dsub}+1, b.s*{dsub}+{dsub}) AS sub,
                   {d_expr} AS d
            FROM corpus c CROSS JOIN cb b
          )
          QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY d, cw) = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM corpus
              WHERE vec_id < {query_cap}),
        qd AS MATERIALIZED (
          SELECT q.query_id, b.s, b.cw,
                 list_slice(q.qv, b.s*{dsub}+1, b.s*{dsub}+{dsub}) AS sub,
                 {d_expr} AS d
          FROM q CROSS JOIN cb b
        ),
        scored AS (
          SELECT d.query_id, c.vec_id, SUM(d.d)::BIGINT AS adc_u
          FROM codes c JOIN qd d ON d.s = c.s AND d.cw = c.code
          GROUP BY d.query_id, c.vec_id
        )"""


def pq_topk_sql(
    corpus_cte: str, m: int = 4, ksub: int = 8, dim: int = 64, k: int = 5,
    query_cap: int = 5,
) -> str:
    """Mirror of pq.pq_topk (ADC scoring over sampled codebooks)."""
    cte = pq_cte_sql(corpus_cte, m, ksub, dim, query_cap)
    return f"""
        WITH {cte}
        SELECT query_id, vec_id, adc_u,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_u, vec_id) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def pq_recall_sql(
    corpus_cte: str, m: int = 4, ksub: int = 8, dim: int = 64, k: int = 5,
    query_cap: int = 5, min_recall: float = 0.5, shortlist: int | None = None,
) -> str:
    """Mirror of pq.pq_recall_summary: exact micro-unit squared-L2 top-k
    vs the PQ/ADC top-``shortlist`` candidate set (the re-rank shortlist
    — the set a real ADC scan hands to exact re-ranking) -> one summary
    row."""
    shortlist = k if shortlist is None else shortlist
    cte = pq_cte_sql(corpus_cte, m, ksub, dim, query_cap)
    return f"""
        WITH {cte},
        exact AS (
          SELECT query_id, vec_id FROM (
            SELECT q.query_id, c.vec_id,
                   list_transform(range(len(c.v)),
                                  i -> c.v[i+1] - q.qv[i+1]) AS df,
                   ROUND(list_dot_product(df, df) * 1000000)::BIGINT AS l2_u
            FROM corpus c CROSS JOIN q
          )
          QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY l2_u, vec_id) <= {k}
        ),
        pq AS (
          SELECT query_id, vec_id FROM scored
          QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_u, vec_id) <= {shortlist}
        ),
        hits AS (
          SELECT e.query_id, e.vec_id FROM exact e
          WHERE EXISTS (SELECT 1 FROM pq p
                        WHERE p.query_id = e.query_id
                          AND p.vec_id = e.vec_id)
        )
        SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
               (SELECT COUNT(*) FROM hits) AS n_recalled,
               ROUND((SELECT COUNT(*) FROM hits)::DOUBLE /
                     (SELECT COUNT(*) FROM exact), 4) AS recall,
               (SELECT COUNT(*) FROM hits)::DOUBLE /
                     (SELECT COUNT(*) FROM exact) >= {min_recall}
                 AS meets_bound
    """


def semantic_dedup_sql(
    corpus_cte: str, n_cells: int = 8, threshold: float = 0.9,
) -> str:
    """Mirror of ivf.semantic_dedup (SemDeDup keep-first pruning): reuse
    the IVF cell-assignment CTEs, drop every vector with a >= threshold
    same-cell neighbor of smaller id."""
    cells = ivf_cells_sql(corpus_cte, n_cells, nprobe=1, query_cap=1)
    cos = COSINE_SQL.format(a="x.v", b="y.v")
    return f"""
        WITH {cells},
        dropped AS (
          SELECT DISTINCT y.vec_id
          FROM assigned x JOIN assigned y
            ON x.cell = y.cell AND x.vec_id < y.vec_id
          WHERE ROUND({cos}, 6) >= {threshold}
        )
        SELECT a.vec_id, a.cell::INT AS cell FROM assigned a
        WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
    """


def quality_classifier_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lr: float = 0.5,
    iters: int = 5,
    scale: int = 10**6,
) -> str:
    """Mirror of classifier.train + classifier.predictions: the ENTIRE
    T-step logistic-regression training loop unrolled into CTE stages.

    Reproducibility rests on three invariants shared with the Spark side
    (classifier.py): (1) the rational fast-sigmoid uses only +,·,/,abs —
    IEEE-754-exact in every engine; (2) per-row gradient contributions
    are micro-quantized to BIGINT before the SUM, so the gradient vector
    is partition-order independent; (3) the weight update is the same
    left-associated double expression ``w - lr * (g / (n*scale))``.
    Weights therefore agree bit-for-bit and the per-doc predictions are
    deterministic across engines."""
    from vector_spark.dataprep.classifier import FEATURE_NAMES

    f = quality_sql_exprs(text_col)
    mirror = {
        "bias": "1.0",
        "uniq_ratio": f["uniq_ratio"],
        "punct_ratio": f["punct_ratio"],
        "digit_ratio": f["digit_ratio"],
        "stop_ratio_en": f["stop_ratio_en"],
    }
    k = len(FEATURE_NAMES)
    xs = ", ".join(
        f"({mirror[n]})::DOUBLE AS x_{j}" for j, n in enumerate(FEATURE_NAMES)
    )
    y = (
        f"CASE WHEN {quality_score_sql_expr(text_col)} >= 0.5 "
        f"THEN 1.0 ELSE 0.0 END"
    )

    def z_chain(w_alias: str) -> str:
        # left-associated like classifier._z: ((w0*x0 + w1*x1) + w2*x2)...
        return " + ".join(f"{w_alias}.w_{j} * f.x_{j}" for j in range(k))

    def sig(z: str) -> str:
        return f"ROUND(0.5 + {z} / (2.0 * (1.0 + abs({z}))), 6)"

    ctes = [
        f"""feats AS MATERIALIZED (
          SELECT {id_col} AS doc_id, {xs}, ({y})::DOUBLE AS y FROM {table}
        )""",
        "nn AS (SELECT COUNT(*)::BIGINT AS n FROM feats)",
        "w0 AS (SELECT "
        + ", ".join(f"0.0::DOUBLE AS w_{j}" for j in range(k))
        + ")",
    ]
    for t in range(1, iters + 1):
        grads = ", ".join(
            f"SUM(ROUND((s - y) * x_{j} * {scale}, 0)::BIGINT)::BIGINT"
            f" AS g_{j}"
            for j in range(k)
        )
        ctes.append(
            f"""g{t} AS (
          SELECT {grads} FROM (
            SELECT f.*, {sig('f.z')} AS s FROM (
              SELECT f.*, ({z_chain('w')}) AS z
              FROM feats f CROSS JOIN w{t - 1} w) f)
        )"""
        )
        upd = ", ".join(
            f"w.w_{j} - {lr} * (g.g_{j}::DOUBLE / (nn.n * {scale})::DOUBLE)"
            f" AS w_{j}"
            for j in range(k)
        )
        ctes.append(f"w{t} AS (SELECT {upd} FROM w{t - 1} w, g{t} g, nn)")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT doc_id, s AS score,
               (s >= 0.5)::INT AS label,
               y::INT AS teacher
        FROM (
          SELECT f.doc_id, f.y, {sig('f.z')} AS s FROM (
            SELECT f.doc_id, f.y, ({z_chain('w')}) AS z
            FROM feats f CROSS JOIN w{iters} w) f)
    """
