"""BM25 keyword relevance scoring over the documents corpus.

Beyond-reference training-data op (like the LM/DSIR layer): keyword
relevance is the standard retrieval primitive for corpus curation —
mining documents that match a topic query, weighting domain-targeted
subsets, or building weak labels for a quality classifier. Okapi BM25
(Robertson et al., TREC-3) with the Lucene idf variant
``ln(1 + (N − df + 0.5) / (df + 0.5))`` — non-negative for any df.

Scale shape: the corpus streams ONCE. Tokens are filtered to the query
terms scan-side, so the shuffle carries only (doc_id, query-term) hits —
O(matches), never O(corpus tokens). Document frequencies for the ≤Q query
terms form a ≤Q-row broadcast dim; corpus size N and average doc length
ride a 1-row broadcast (exact integer sums in double — bit-stable). No
full-vocabulary table is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.dataprep.text import words


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-words query.

    Returns ``(id_col, n_terms, bm25)`` for documents matching ≥1 query
    term (BM25 of a no-match document is 0 — emitting only matches keeps
    the output O(matches)).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    w = docs.select(
        F.col(id_col), words(F.col(text_col)).alias("ws")
    ).select(id_col, "ws", F.size("ws").cast("double").alias("dl"))

    stats = w.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    hits = (
        w.select(id_col, "dl", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
    )
    tf = hits.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = hits.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("dft")
    )

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("dft") + 0.5)
                / (F.col("dft") + 0.5)
            ),
        )
        .withColumn(
            "score_t",
            F.col("idf") * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("score_t").alias("bm25"),
    )
