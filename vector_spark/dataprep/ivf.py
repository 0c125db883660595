"""IVF (inverted-file) approximate nearest-neighbor search over an
``array<float>`` embedding column.

The scale story (vs the sign-LSH path in :mod:`similarity`):

- **Partition/train**: the corpus is coarse-quantized into ``n_cells``
  Voronoi cells around centroid vectors. Two trainers:

  * :func:`sampled_centroids` — centroids are *sampled corpus vectors*
    (the classic cheap IVF variant: no arithmetic, so the cell
    assignment is bit-reproducible by an external SQL oracle — this is
    what the driver-gated queries use).
  * :func:`kmeans_refine` — Lloyd iterations expressed as DataFrame ops
    (assign = broadcast argmax, update = posexplode → per-(cell, dim)
    mean → re-assemble). Float-summation order differs between engines,
    so this path is pytest-verified against a NumPy oracle instead of
    the DuckDB gate.

- **Index**: at the 10^12 tier the assigned corpus is written
  ``partitionBy("cell")``; a query then touches only its ``nprobe``
  cell partitions (partition pruning does the rest). In-session the
  same shape is an equi-join on ``cell``.

- **Search**: queries rank cells by centroid dot product, probe the top
  ``nprobe`` cells, score exact cosine inside them, take per-query
  top-k. Work per query ≈ nprobe/n_cells of the corpus instead of all
  of it.

Centroids are driver-side literals (IVF centroid tables are small by
construction — √N cells for N vectors; at 10^12 rows and 64 dims that is
a ~256 MB broadcast, which is why :func:`assign_cells` also takes a
DataFrame and broadcast-joins when the literal form would be too large).

All vector math is JVM higher-order functions — no Python in the hot
path. Reference: the reference engine has no ANN surface (SURVEY §2.8);
this is a beyond-reference dataprep component (brief: "IVF or
LSH-bucketed variant as the scale path").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.dataprep.similarity import cosine, dot


def sampled_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Centroids = the corpus vectors with the ``n_cells`` smallest ids,
    copied verbatim (no arithmetic → exactly reproducible by any engine).
    Deterministic sampling is the standard cheap alternative to k-means
    training for IVF coarse quantizers."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _centroid_array(centroids: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )


def _cell_dots(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of dot(vec, centroid_i), one fold per centroid —
    O(n_cells · dim) per row, the unavoidable quantization cost."""
    return F.transform(_centroid_array(centroids), lambda c: dot(vec, c))


def assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Stamp each vector with its nearest cell (max centroid dot product,
    first-max on ties — matches ``list_position(dots, list_max(dots))``
    in the SQL oracle). Pure column math, no shuffle."""
    dots = _cell_dots(F.col(vec_col), centroids)
    return corpus.withColumn(
        cell_col,
        (F.array_position(dots, F.array_max(dots)) - 1).cast("int"),
    )


def probe_cells(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """One row per (query, probed cell): cells ranked by centroid dot
    product descending (ties → lower cell id), top ``nprobe`` kept."""
    dots = _cell_dots(F.col(vec_col), centroids)
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                (-F.element_at(dots, i + 1)).alias("nd"),
                i.cast("int").alias("c"),
            ),
        )
    )
    probes = F.transform(
        F.slice(ranked, 1, nprobe), lambda s: s.getField("c")
    )
    return queries.withColumn(cell_col, F.explode(probes))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 2,
    k: int = 5,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: assign corpus to cells, probe ``nprobe`` cells per
    query, exact cosine inside probed cells, per-query top-k.

    Returns (query_id, vec_id, cosine, rank) like
    :func:`similarity.brute_force_topk` — same schema so recall is a
    direct join. The corpus side is one scan + a broadcast-joined cell
    filter; the only shuffle is the final per-query top-k."""
    if centroids is None:
        centroids = sampled_centroids(
            corpus, n_cells, vec_col=vec_col, id_col=id_col
        )
    assigned = assign_cells(corpus, centroids, vec_col=vec_col)
    probes = probe_cells(
        queries.select(query_id_col, F.col(vec_col).alias("__qv")),
        centroids,
        nprobe,
        vec_col="__qv",
    )
    scored = assigned.join(F.broadcast(probes), "cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_recall_summary(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 2,
    k: int = 5,
    min_recall: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard recall gate: IVF top-k vs brute-force top-k on the same
    corpus/queries → one (n_exact, n_recalled, recall, meets_bound) row;
    RAISES below ``min_recall`` so the driver query is pass/fail."""
    from vector_spark.dataprep.similarity import brute_force_topk

    # corpus is referenced by the exact leg, the IVF leg, AND the centroid
    # sample collect — truncate its lineage once so the (often synthetic)
    # upstream expression tree isn't re-inlined and re-run per reference
    # (same rationale as similarity.lsh_recall_summary)
    corpus = corpus.localCheckpoint(eager=False)
    exact = brute_force_topk(
        corpus, queries, k=k, vec_col=vec_col, id_col=id_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    found = ivf_topk(
        corpus, queries, n_cells=n_cells, nprobe=nprobe, k=k,
        vec_col=vec_col, id_col=id_col, query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    hit = exact.join(found, [query_id_col, id_col], "left_semi")
    summary = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_recalled")))
        .select(
            "n_exact",
            "n_recalled",
            F.round(F.col("n_recalled") / F.col("n_exact"), 4).alias(
                "recall"
            ),
            (
                F.col("n_recalled") / F.col("n_exact") >= min_recall
            ).alias("meets_bound"),
        )
        .persist()
    )
    row = summary.collect()[0]
    assert row.n_exact > 0, "recall gate needs non-empty exact top-k"
    assert row.meets_bound, (
        f"IVF recall {row.recall} below bound {min_recall} "
        f"({row.n_recalled}/{row.n_exact})"
    )
    return summary


def kmeans_refine(
    corpus: DataFrame,
    centroids: list[list[float]],
    iters: int = 1,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd refinement of the coarse centroids, as DataFrame ops:
    assign (broadcast argmax, no shuffle) → per-(cell, dim) mean
    (posexplode + one hash aggregate) → reassemble on the driver
    (n_cells · dim scalars — tiny). Empty cells keep their previous
    centroid. O(iters) jobs, each one shuffle of n_cells·dim rows.

    Float-mean summation order is engine-specific, so this trainer is
    verified against a NumPy oracle in pytest rather than the DuckDB
    driver gate (see test_ivf.py)."""
    dim = len(centroids[0])
    cur = centroids
    for _ in range(iters):
        assigned = assign_cells(corpus, cur, vec_col=vec_col)
        means = (
            assigned.select("cell", F.posexplode(vec_col))
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cell",
                F.transform("pm", lambda s: s.getField("m")).alias("c"),
            )
            .collect()
        )
        nxt = [list(c) for c in cur]
        for r in means:
            vec = [float(x) for x in r["c"]]
            assert len(vec) == dim
            nxt[r["cell"]] = vec
        cur = nxt
    return cur


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning in embedding space — coarse-cluster the
    corpus, compare cosines only WITHIN a cell, and drop every vector
    that has a >= ``threshold`` neighbor with a smaller id in its cell
    (deterministic keep-first; the paper keeps one exemplar per
    duplicate set, exemplar choice unspecified).

    Returns the KEPT rows as (id, cell). Scale shape: the cross-cell
    quadratic is avoided entirely — pairs form inside cells only, and
    ``n_cells`` grows with the corpus so cell populations stay bounded
    (the paper runs 50k clusters at LAION scale); the pair join carries
    (id, vec) within co-partitioned cells, and the final step is a
    broadcast anti-join of the dropped-id set.
    """
    cents = sampled_centroids(corpus, n_cells, vec_col=vec_col, id_col=id_col)
    cells = assign_cells(corpus, cents, vec_col=vec_col).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "cell"
    ).persist()
    a = cells.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), "cell"
    )
    b = cells.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), "cell"
    )
    from vector_spark.dataprep.similarity import cosine

    dropped = (
        a.join(b, on=["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine(F.col("__va"), F.col("__vb")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias("__dropped"))
        .distinct()
    )
    return (
        cells.join(
            dropped, cells["__id"] == dropped["__dropped"], "left_anti"
        )
        .select(F.col("__id").alias(id_col), "cell")
    )
