"""Product-quantization ANN (Jégou, Douze & Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011) over an ``array<float>``
embedding column — the compressed-index scale path of the ANN family
(brute force → LSH buckets → IVF cells → PQ codes).

Why PQ at the 10^12 tier: the index stores ``m`` small code ids per
vector instead of the vector itself — at 64 dims × float32 vs m=4 byte
codes that is a ~64× smaller scan, and query scoring reads ONLY the code
table (the raw corpus vectors never leave the lake). Scoring is ADC
(asymmetric distance computation): each query precomputes an m × ksub
table of subspace distances ONCE, then every corpus row costs m integer
lookups + adds instead of a dim-length float fold.

Engine-portability contract (what makes the DuckDB oracle bit-exact):

- **Codebooks are sampled corpus vectors** (the ``ksub`` smallest ids,
  sliced per subspace) — no arithmetic, same trick as
  :func:`ivf.sampled_centroids`, so any engine reproduces them.
- **All distances are integer micro-units**: the subspace squared-L2
  ``d = self(a) - 2·dot(a, c) + self(c)`` is rounded once to
  ``round(d · 10^6)`` BIGINT. Sums and argmins over BIGINT are
  order-independent — no float-summation-order hazard anywhere in the
  index or the scores (ties at encode break to the lower codeword id,
  final ranking ties to the lower vec id).
- Spark side is pure JVM higher-order functions / literal arrays — no
  Python in the hot path; queries (with their ADC tables) broadcast.

Like IVF/LSH this is a beyond-reference dataprep component (the
reference engine has no ANN surface, SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.functions.objects import let

MICRO = 1_000_000  # micro-unit scale for integer distance math


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """``m × ksub × dsub`` codebooks: codeword ``j`` of subspace ``s`` is
    the ``s``-th slice of the corpus vector with the (j+1)-th smallest id
    — copied verbatim (bit-reproducible by any engine)."""
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [[v[s * dsub : (s + 1) * dsub] for v in vecs] for s in range(m)]


def _let_sql(value: str, var: str, body: str) -> str:
    """SQL twin of objects.let — bind ``value`` once via a one-element
    transform (same construction, same evaluation semantics)."""
    return f"element_at(transform(array({value}), {var} -> {body}), 1)"


def _book_sql(book: list[list[float]]) -> str:
    """The codebook as ONE SQL literal ``array<struct<cv array<double>,
    sc double>>`` parsed in a single ``F.expr`` — Column-API construction
    here would issue one py4j round trip per literal/lambda (ksub x dsub
    = thousands of calls, ~50 s of pure driver time per query at m=8 /
    ksub=32) while the SQL string parses JVM-side in milliseconds.
    ``repr(float)`` round-trips binary64 exactly, so the literals are
    bit-identical to the collected codebook values."""

    def vec(v: list[float]) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in v) + ")"

    entries = ",".join(
        f"struct({vec(c)} AS cv, {_self(c)!r}D AS sc)" for c in book
    )
    return f"array({entries})"


def _dot_sql(a: str, b: str) -> str:
    """SQL twin of similarity.dot — identical fold order, so results are
    bit-identical to the Column version and the oracle contract holds."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
        " (acc, v) -> acc + v)"
    )


def _dists_sql(
    vec_col: str, offset: int, dsub: int, book: list[list[float]]
) -> str:
    """SQL micro-unit distance array from the ``dsub``-wide subvector at
    0-based ``offset`` of ``vec_col`` to each codeword — one transform
    over the literal codebook, arithmetic shaped exactly as the module
    docstring documents. (A fully unrolled literal-coefficient form was
    tried and is SLOWER: the ~600-node-per-subspace tree blows the
    codegen method limit and falls back to interpreting thousands of
    element_at nodes per row.)"""
    inner = _let_sql(
        _dot_sql("sub", "sub"),
        "selfa",
        f"transform({_book_sql(book)}, e -> CAST(ROUND((selfa - 2.0D * "
        + _dot_sql("sub", "e.cv")
        + " + e.sc) * 1000000) AS BIGINT))",
    )
    return _let_sql(f"slice(`{vec_col}`, {offset + 1}, {dsub})", "sub", inner)


def _self(v: list[float]) -> float:
    acc = 0.0
    for x in v:  # sequential IEEE sum — same fold order as dot()
        acc += x * x
    return acc


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Stamp each vector with its ``array<int>`` PQ code (per subspace:
    argmin micro-distance, ties → lower codeword id). Pure column math,
    no shuffle; at the real tier the (id, codes) table IS the index that
    gets written out — ``m`` bytes/vector instead of the vector."""
    m, dsub = len(codebooks), len(codebooks[0][0])

    def code_for(s: int) -> str:
        return _let_sql(
            _dists_sql(vec_col, s * dsub, dsub, codebooks[s]),
            "d",
            "CAST(array_position(d, array_min(d)) - 1 AS INT)",
        )

    codes = "array(" + ",".join(code_for(s) for s in range(m)) + ")"
    return df.withColumn(code_col, F.expr(codes))


def pq_query_tables(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    tab_col: str = "tab",
) -> DataFrame:
    """Per-query ADC table → ``array<array<long>>`` (m × ksub micro-unit
    distances), computed ONCE per query."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    tab = "array(" + ",".join(
        _dists_sql(vec_col, s * dsub, dsub, codebooks[s]) for s in range(m)
    ) + ")"
    return queries.withColumn(tab_col, F.expr(tab))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 4,
    ksub: int = 8,
    k: int = 5,
    codebooks: list[list[list[float]]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ/ADC search: encode the corpus, broadcast the queries with their
    ADC tables, score = Σ_s tab[s][code_s] (BIGINT adds — m lookups per
    pair, never a dim-length float fold), per-query top-k ascending.

    Returns (query_id, vec_id, adc_u, rank); ``adc_u`` is the micro-unit
    approximate squared L2 distance. The only shuffle is the final
    per-query top-k."""
    if codebooks is None:
        codebooks = pq_codebooks(corpus, m, ksub, vec_col=vec_col, id_col=id_col)
    m = len(codebooks)
    encoded = pq_encode(corpus, codebooks, vec_col=vec_col).select(id_col, "codes")
    qtabs = pq_query_tables(
        queries.select(query_id_col, vec_col), codebooks, vec_col=vec_col
    ).select(query_id_col, "tab")
    scored = encoded.join(F.broadcast(qtabs)).select(
        query_id_col,
        id_col,
        F.aggregate(
            F.sequence(F.lit(1), F.lit(m)),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.element_at(
                F.element_at(F.col("tab"), s),
                F.element_at(F.col("codes"), s) + 1,
            ),
        ).alias("adc_u"),
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_u", id_col)
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def exact_l2_topk_u(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force micro-unit squared-L2 top-k — the exact baseline the
    PQ recall gate compares against (same distance, same units)."""
    q = F.broadcast(
        queries.select(query_id_col, F.col(vec_col).alias("__qv"))
    )
    d = let(
        F.zip_with(
            F.col(vec_col), F.col("__qv"), lambda x, y: (x - y) * (x - y)
        ),
        lambda sq: F.round(
            F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v) * MICRO
        ).cast("long"),
    )
    scored = corpus.join(q).select(query_id_col, id_col, d.alias("l2_u"))
    w = Window.partitionBy(query_id_col).orderBy("l2_u", id_col)
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_recall_summary(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 4,
    ksub: int = 8,
    k: int = 5,
    min_recall: float = 0.5,
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """One-row recall summary (exact-L2 top-k ∩ PQ top-``shortlist`` /
    exact), with a hard assert below ``min_recall`` — same gate pattern
    as ivf.ivf_recall_summary (lineage truncated once for the same
    multi-reference reason).

    ``shortlist`` defaults to ``k``; real ADC deployments score the
    compressed codes to produce a shortlist (here 100 of the corpus)
    and exact-re-rank only that — recall@shortlist is the measure that
    decides whether the compressed index may replace the full scan."""
    shortlist = k if shortlist is None else shortlist
    corpus = corpus.localCheckpoint(eager=False)
    pq = pq_topk(
        corpus, queries, m=m, ksub=ksub, k=shortlist,
        vec_col=vec_col, id_col=id_col, query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    exact = exact_l2_topk_u(
        corpus, queries, k,
        vec_col=vec_col, id_col=id_col, query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    hits = exact.join(pq, [query_id_col, id_col], "left_semi")
    summary = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_recalled")))
        .select(
            "n_exact",
            "n_recalled",
            F.round(F.col("n_recalled") / F.col("n_exact"), 4).alias("recall"),
            (F.col("n_recalled") / F.col("n_exact") >= min_recall).alias(
                "meets_bound"
            ),
        )
        .persist()
    )
    row = summary.collect()[0]
    assert row.n_exact > 0, "recall gate needs non-empty exact top-k"
    assert row.meets_bound, (
        f"PQ recall {row.recall} below bound {min_recall} "
        f"({row.n_recalled}/{row.n_exact})"
    )
    return summary
