"""Hybrid retrieval: fuse a sparse (BM25) and a dense (embedding-cosine)
ranking with reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09) —
the standard way a curation/eval pipeline combines keyword and semantic
relevance without score calibration.

Scale shape: both legs arrive already ranked and CUT to their own top-k
(BM25 shuffles only query-term hits — ``bm25.py``; dense top-k is a
broadcast-queries corpus scan or an IVF/LSH/PQ shortlist — ``similarity
.py``/``ivf.py``/``pq.py``), so the fusion join touches
O(queries × k) rows regardless of corpus size: a full outer join on
(query, id) plus one rank window per query over ≤ 2k candidates. RRF
uses only the integer RANKS, never the incomparable raw scores, which is
also what makes the fused output engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two (query, id, rank) candidate lists:
    ``rrf = Σ_legs 1/(c + rank)`` (a missing leg contributes 0), then the
    per-query top-``k`` by (rrf desc, id). Both inputs must carry integer
    1-based ranks; the fused ``rrf`` is a two-term sum of exact reciprocals,
    so it is bit-identical across engines and safe to rank on directly.
    Returns (query, id, rank_sparse, rank_dense, rrf, fused_rank)."""
    from pyspark.sql import Window

    s = sparse.select(
        query_col, id_col, F.col(rank_col).cast("long").alias("rank_sparse")
    )
    d = dense.select(
        query_col, id_col, F.col(rank_col).cast("long").alias("rank_dense")
    )
    fused = (
        s.join(d, [query_col, id_col], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (c + F.col("rank_sparse")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (c + F.col("rank_dense")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf"), id_col)
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(
            query_col,
            id_col,
            "rank_sparse",
            "rank_dense",
            F.round("rrf", 6).alias("rrf"),
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


def bm25_ranked(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 leg for one query: scores via :func:`bm25.bm25_scores`, then
    the top-``k`` by (round(bm25, 6) desc, id). Rounding BEFORE ranking
    collapses sub-1e-6 float-summation differences so the rank — the only
    thing RRF consumes — is partition-order- and engine-stable."""
    from pyspark.sql import Window

    from vector_spark.dataprep.bm25 import bm25_scores

    scored = bm25_scores(docs, query_terms, text_col=text_col, id_col=id_col)
    # distributed top-k cut FIRST (plans as TakeOrderedAndProject — no
    # global single-partition sort), then rank the ≤k survivors
    top = (
        scored.select(id_col, F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
    w = Window.orderBy(F.desc("bm25"), id_col)
    return top.withColumn("rank", F.row_number().over(w))
