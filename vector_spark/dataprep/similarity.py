"""Embedding similarity search over an ``array<float>`` column.

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus; ONE corpus scan, no corpus shuffle — the correct
  100 TB baseline shape (corpus-side work is embarrassingly parallel; the
  only shuffle is the final per-query top-k over candidate rows ≪ corpus).
- :func:`lsh_bucketed_topk` — the scale path: deterministic sign-random-
  projection buckets; queries probe only their bucket (corpus pre-bucketed
  once, reused across query batches).

All vector math is JVM higher-order functions (``zip_with`` + ``aggregate``)
— no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × corpus scan.

    Returns (query_id, vec_id, cosine, rank), rank 1..k, ties broken by
    corpus id (deterministic).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    )
    scored = corpus.join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: all-pairs cosine with
    id_a < id_b, keep pairs ≥ threshold. Quadratic — the correctness
    baseline; use :func:`embedding_near_dups_lsh` at corpus scale."""
    # norms precomputed per ROW (identical arithmetic to inline cosine —
    # same fold, evaluated n times instead of n² times; bit-identical)
    base = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
    ).persist()
    a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
                    F.col("__n").alias("__na"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
                    F.col("__n").alias("__nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dups_lsh(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int = 8,
    plane_sets: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scale path: sign-LSH bucket the corpus once, generate candidate
    pairs only within buckets, verify with exact cosine. High-cosine pairs
    land in the same bucket with probability (1 - theta/pi)^planes — at
    0.95 cosine and 8 planes ≈ 0.75 recall per table; ``plane_sets`` > 1
    unions the pairs of several independent plane sets (standard banding)
    for higher recall; pairs found by multiple sets are deduped by a
    DISTINCT on the (id, id) key before the final projection."""
    bucketed = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        *[
            sign_lsh_bucket(
                F.col(vec_col), dim, planes, seed0=1 + s * planes
            ).alias(f"__bucket{s}")
            for s in range(plane_sets)
        ],
    ).persist()  # bucket table computed once for every self-join side
    # ONE self-join on the exploded (plane_set, bucket) key instead of
    # plane_sets separate joins + union: same candidate set (a pair from
    # set s matches at set==s), one shuffle, plane_sets× fewer stages.
    keys = bucketed.select(
        "__id",
        F.posexplode(
            F.array(*[F.col(f"__bucket{s}") for s in range(plane_sets)])
        ).alias("__set", "__bkt"),
    )
    cand = (
        keys.alias("l")
        .join(
            keys.alias("r"),
            on=[
                F.col("l.__set") == F.col("r.__set"),
                F.col("l.__bkt") == F.col("r.__bkt"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()  # dedup BEFORE the expensive cosine verify
    )
    va = bucketed.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    vb = bucketed.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def _projection_vector(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from a seeded LCG (no
    numpy RNG state, reproducible everywhere)."""
    out, x = [], seed * 2654435761 % (2**31)
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (2**31)
        out.append(1.0 if (x >> 16) & 1 else -1.0)
    return out


def sign_lsh_bucket(vec: Column, dim: int, planes: int = 8, seed0: int = 1) -> Column:
    """Sign-random-projection bucket id: ``planes`` bits from deterministic
    ±1 hyperplanes (seeds ``seed0 .. seed0+planes-1``) → int bucket in
    [0, 2^planes)."""
    bucket = F.lit(0)
    for p in range(planes):
        plane = F.array(*[F.lit(v) for v in _projection_vector(seed0 + p, dim)])
        bit = (dot(vec, plane) > 0).cast("int")
        bucket = bucket * 2 + bit
    return bucket


def planted_near_dup_corpus(
    emb: DataFrame,
    dim: int,
    every: int = 5,
    eps: float = 0.04,
    perturb_seed: int = 991,
    id_offset: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus with deterministically PLANTED near-duplicates for recall
    gating: every ``every``-th vector gets a copy (id + ``id_offset``)
    perturbed by ``eps·‖v‖`` along a fixed ±1 direction — closed-form, so
    an external SQL oracle reproduces the identical corpus. With eps=0.04
    on 64-dim the planted pair cosine lands ≈0.95."""
    u = F.array(*[F.lit(v) for v in _projection_vector(perturb_seed, dim)])
    scale = F.lit(eps) * norm(F.col(vec_col))
    planted = emb.filter(F.col(id_col) % every == 0).select(
        (F.col(id_col) + id_offset).alias(id_col),
        F.zip_with(
            F.col(vec_col), u, lambda x, w: x + scale * w
        ).alias(vec_col),
    )
    return emb.select(id_col, vec_col).unionAll(planted)


def lsh_recall_summary(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    planes: int = 4,
    plane_sets: int = 3,
    min_recall: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall gate: exact near-dup pairs vs the LSH-found subset on the
    SAME corpus → one row (n_exact, n_recalled, recall, meets_bound).

    Raises ``AssertionError`` when recall < ``min_recall`` — registering
    this as a driver query makes LSH recall a hard pass/fail signal, and
    every number in the row is closed-form reproducible by a SQL oracle
    (the planes are literal arrays), so the row is also bit-exact checkable.
    """
    # The corpus subtree (typically a planted-perturbation expression with
    # literal plane/dim arrays) is referenced by BOTH self-join sides of the
    # exact pass and by every plane-set of the LSH pass — inlined, the
    # summary's optimized plan reached ~680 KB and the optimizer ran it per
    # reference. The harness corpus is small by construction (the exact leg
    # is quadratic), so truncate its lineage once; lazy so callers that
    # already materialized pay nothing extra.
    corpus = corpus.localCheckpoint(eager=False)
    exact = embedding_near_dups(
        corpus, threshold=threshold, vec_col=vec_col, id_col=id_col
    ).select("id_a", "id_b")
    found = embedding_near_dups_lsh(
        corpus,
        dim=dim,
        threshold=threshold,
        planes=planes,
        plane_sets=plane_sets,
        vec_col=vec_col,
        id_col=id_col,
    ).select("id_a", "id_b")
    hit = exact.join(found, ["id_a", "id_b"], "left_semi")
    summary = exact.agg(F.count(F.lit(1)).alias("n_exact")).crossJoin(
        hit.agg(F.count(F.lit(1)).alias("n_recalled"))
    ).select(
        "n_exact",
        "n_recalled",
        F.round(F.col("n_recalled") / F.col("n_exact"), 4).alias("recall"),
        (F.col("n_recalled") / F.col("n_exact") >= min_recall).alias(
            "meets_bound"
        ),
    ).persist()  # the assertion collect below already computes the full
    # pair join; persist the 1-row summary so the caller's action doesn't
    # run the quadratic exact pass a second time
    row = summary.collect()[0]
    assert row.n_exact > 0, "recall gate needs a non-empty exact pair set"
    assert row.meets_bound, (
        f"LSH recall {row.recall} below bound {min_recall} "
        f"({row.n_recalled}/{row.n_exact} pairs found)"
    )
    return summary


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: corpus and queries hashed to sign-LSH buckets;
    each query scores only its bucket (~corpus/2^planes rows). At the
    10^12 tier the corpus is written partitioned by bucket so a query
    touches one partition (partition pruning does the rest)."""
    cb = corpus.withColumn("__bucket", sign_lsh_bucket(F.col(vec_col), dim, planes))
    qb = queries.select(
        query_id_col, F.col(vec_col).alias("__qv")
    ).withColumn("__bucket", sign_lsh_bucket(F.col("__qv"), dim, planes))
    scored = cb.join(F.broadcast(qb), on="__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_health(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str | None = "label",
) -> DataFrame:
    """Embedding-table health report, per group (or one global row):
    vector count, dimension consistency (distinct lengths — anything but
    1 means a corrupt/mixed table), count of vectors containing
    NaN/±Inf, zero-vector count (norm 0 — un-embedded rows), and the
    L2-norm min/mean/max — the pre-flight check before an ANN build
    (IVF/PQ assume finite, consistently-dimensioned, mostly-unit-ish
    vectors; a drifting norm distribution also flags encoder-version
    mix-ups).

    One map-side-combined aggregation; norms are computed scan-side with
    F.aggregate (no UDF). Non-finite vectors are COUNTED but excluded
    from the norm stats (one NaN would otherwise poison min/mean/max).
    Norms ROUND(…, 4) for engine portability."""
    v = F.col(vec_col)
    sq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    nrm = F.sqrt(sq)
    bad = F.exists(v, lambda x: x.isNaN() | (F.abs(x) == float("inf")))
    key = (
        [F.col(group_col).alias("group_key")]
        if group_col
        else [F.lit("all").alias("group_key")]
    )
    return (
        df.select(
            *key,
            F.size(v).alias("__dim"),
            F.when(~bad, nrm).alias("__n"),
            bad.cast("int").alias("__bad"),
        )
        .groupBy("group_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.count_distinct("__dim").cast("long").alias("n_dims"),
            F.min("__dim").cast("long").alias("dim"),
            F.sum("__bad").cast("long").alias("n_nonfinite"),
            F.sum((F.col("__n") == 0.0).cast("int")).cast("long").alias(
                "n_zero"
            ),
            F.round(F.min("__n"), 4).alias("norm_min"),
            # micro-quantized mean (integer sum of round(norm·1e4)):
            # float addition isn't associative, so a plain AVG can
            # differ in the last ulp across partitionings/engines —
            # integer sums are exact and order-free (the lm.py trick)
            F.round(
                F.sum(F.round(F.col("__n") * 10000).cast("long"))
                / (F.lit(10000.0) * F.count("__n")),
                4,
            ).alias("norm_mean"),
            F.round(F.max("__n"), 4).alias("norm_max"),
        )
    )
