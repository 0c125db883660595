"""Deterministic source-mixture sampling for training corpora.

Pretraining datasets are mixed from sources with target weights (e.g.
web 60% / code 20% / books 20%). This operator draws an EXACT quota per
source, deterministically (hash-ranked, so re-execution and retries pick
the same documents — no RNG state).

Scale shape: ranking is a per-source window sort — one shuffle on the
source key, the same exchange a groupBy would pay, and AQE splits skewed
sources. For corpora where even per-source sorting is too hot, the
documented alternative is hash-THRESHOLD sampling (keep rows with
``pmod(hash, M) < rate*M`` — no shuffle, approximate counts); this module
implements the exact-quota path since mixture weights are usually
contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate_quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder apportionment: integer quotas summing to
    ``total``, proportional to ``weights`` (deterministic tie-break by
    source name)."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    s = float(sum(weights.values()))
    if s <= 0:
        raise ValueError("weights must sum to a positive value")
    raw = {k: total * w / s for k, w in weights.items()}
    base = {k: int(v) for k, v in raw.items()}
    short = total - sum(base.values())
    by_rem = sorted(raw, key=lambda k: (-(raw[k] - base[k]), k))
    for k in by_rem[:short]:
        base[k] += 1
    return base


def sample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep a hash-ranked sample of exactly ``quota[source]`` rows per
    source (fewer if the source is smaller than its quota — quotas are not
    redistributed, mirroring how mixture shortfalls are surfaced, not
    hidden). Rank order is ``md5(key)`` — portable across engines, so an
    external SQL engine reproduces the exact same sample."""
    quotas = allocate_quotas(weights, total)
    qmap = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.filter(F.col(source_col).isin(list(quotas)))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= qmap[F.col(source_col)])
        .drop("__rk")
    )


def hash_threshold_mixture(
    df: DataFrame,
    total: int,
    alpha: float = 1.0,
    weights: dict[str, float] | None = None,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """The NO-SHUFFLE mixture sampler (the scale path promised in the
    module docstring): keep a row iff ``hash64(key) < p_source * 2^60``
    — a scan-side filter after a broadcast join with a per-source
    probability dim. Counts are approximate (binomial around the quota)
    but no corpus-wide sort/shuffle happens, so it is the shape to use
    when even per-source window ranking is too hot.

    ``weights=None`` derives TEMPERATURE-SCALED weights from the observed
    source sizes: ``w_s = n_s ** alpha`` (alpha<1 up-samples small
    sources, the standard multilingual-LM mixing rule; alpha=1 is
    proportional, alpha=0 uniform). Keep probability is
    ``min(1, total * w_s / (sum_w * n_s))``, ROUNDed to 12 decimals so
    any engine recomputing it from the same counts lands on the same
    double, making the integer threshold — and therefore the exact
    sample membership — engine-portable and retry-stable.

    The selection hash is the 60-bit md5 family (`dedup.shingle_hash64`)
    — uniform, deterministic, reproducible in plain SQL.
    """
    from vector_spark.dataprep.dedup import shingle_hash64

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    if weights is None:
        wcol = F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    else:
        wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
        wcol = wmap[F.col(source_col)].cast("double")
        counts = counts.filter(wcol.isNotNull())
    dim = counts.withColumn("__w", wcol)
    # global window over the SOURCE DIM (a handful of rows), not the corpus
    dim = dim.withColumn("__sw", F.sum("__w").over(Window.partitionBy()))
    dim = dim.withColumn(
        "__p",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(total)) * F.col("__w") / (F.col("__sw") * F.col("__n")),
            ),
            12,
        ),
    ).withColumn(
        "__thr", (F.col("__p") * F.lit(float(1 << 60))).cast("long")
    )
    return (
        df.join(
            F.broadcast(dim.select(source_col, "__thr")), on=source_col
        )
        .filter(shingle_hash64(F.col(key_col).cast("string")) < F.col("__thr"))
        .drop("__thr")
    )


def epoch_order(
    df: DataFrame,
    epoch: int,
    key_col: str = "chunk_id",
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic per-epoch global shuffle order for training chunks:
    adds ``position`` (0-based, a permutation of the rows) where the
    epoch-``e`` order is by ``hash64('epoch{e}~' ~ key)`` — every epoch
    is a different, reproducible, RNG-free permutation, and any worker
    can recompute its slice without coordination.

    Scale shape: positions are a GLOBAL ranking, but the plan is the same
    two-phase trick as ``packing.pack_sequences`` — rank within
    value-derived hash buckets (per-bucket window), then add broadcast
    per-bucket offsets (tiny aggregate). No global single-task sort.
    """
    from pyspark.sql import Window

    from vector_spark.dataprep.dedup import shingle_hash64

    h = shingle_hash64(
        F.concat(F.lit(f"epoch{epoch}~"), F.col(key_col).cast("string"))
    )
    # bucket = TOP bits of the 60-bit hash, so (bucket, hash) order IS
    # hash order and cross-bucket offsets compose into the global rank
    shift = (1 << 60) // buckets
    d = df.withColumn("__h", h).withColumn(
        "__bkt", F.floor(F.col("__h") / F.lit(shift)).cast("int")
    )
    totals = d.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__bkt").orderBy("__h", key_col)
    return (
        d.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "position", F.col("__off") + F.row_number().over(w_in) - 1
        )
        .drop("__bkt", "__h", "__off")
    )


def split_assign(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — a pure scan-side
    projection (no shuffle, no RNG): bucket = first split whose cumulative
    fraction bound exceeds ``hash64(salt ~ key) / 2^60``.

    Properties a training pipeline needs and ``randomSplit`` lacks:
    retry-stable (hash of the key, not task-local RNG), engine-portable
    (the md5 family, reproducible in plain SQL), and STABLE UNDER CORPUS
    GROWTH — a document's split never changes when other documents are
    added or removed, so eval sets stay frozen across corpus versions.
    ``salt`` namespaces independent splits over the same keys.
    """
    from vector_spark.dataprep.dedup import shingle_hash64

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    h = shingle_hash64(
        F.concat(F.lit(salt), F.lit("~"), F.col(key_col).cast("string"))
    )
    names = list(fractions)
    expr = None
    for name, bound in split_bounds(fractions):
        cond = h < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    salt: str = "split",
    max_iters: int = 20,
) -> DataFrame:
    """Duplicate-cluster-aware train/val/test assignment: documents that
    are (near-)duplicates of each other MUST land in the same split —
    per-document hashing (plain :func:`split_assign`) puts one copy of a
    duplicated page in train and another in val, silently leaking
    training data into every eval metric.

    The split key is the duplicate-cluster REPRESENTATIVE (connected
    components over ``pairs`` via :func:`~vector_spark.dataprep.dedup.
    dup_clusters`, rep = min member id); singletons key on their own id.
    Every member then inherits its cluster's hash bucket, so a whole
    near-dup family moves between splits atomically — and, like
    split_assign, assignments stay frozen under corpus growth.

    Plan: component labels (a constant number of shuffles per
    propagation round; pointer-doubling inside ``dup_clusters`` makes
    rounds O(log diameter), and non-convergence within ``max_iters``
    raises rather than silently splitting a cluster) → left equi-join of
    the corpus to the label dim (bounded by documents that HAVE a
    duplicate — typically a small fraction; AQE broadcasts it when
    small) → the same pure-projection hash bucketing as split_assign.
    Output adds ``split_key`` (the governing id) and ``split``."""
    from vector_spark.dataprep.dedup import dup_clusters

    clusters = dup_clusters(pairs, id_a, id_b, max_iters=max_iters)
    rep = clusters.select(
        F.col("member").alias(key_col), F.col("cluster").alias("__rep")
    )
    keyed = (
        df.join(rep, key_col, "left")
        .withColumn(
            "split_key",
            F.coalesce(F.col("__rep"), F.col(key_col)).cast("string"),
        )
        .drop("__rep")
    )
    return split_assign(keyed, fractions, key_col="split_key", salt=salt)


def split_leakage_audit(
    pairs: DataFrame,
    splits: DataFrame,
    key_col: str = "doc_id",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cross-split leakage report: for every (near-)dup pair, the splits
    of its two endpoints — ``(split_a, split_b, n_pairs, leaked)`` with
    the pair ordered lexically so (train,val) and (val,train) fold
    together. ``leaked`` rows are eval contamination;
    :func:`leakage_safe_split` drives them to zero by construction,
    per-document hashing does not — run this audit on BOTH to prove it.

    Plan: two equi-joins of the pair list against the (key, split)
    projection — the pair side is usually orders of magnitude smaller
    than the corpus, so AQE broadcasts the probe; the report itself is
    a ≤(splits²)-row aggregate."""
    s = splits.select(
        F.col(key_col).alias("__k"), F.col(split_col).alias("__s")
    )
    j = pairs.join(
        s.select(F.col("__k").alias(id_a), F.col("__s").alias("__sa")), id_a
    ).join(
        s.select(F.col("__k").alias(id_b), F.col("__s").alias("__sb")), id_b
    )
    return (
        j.select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn("leaked", F.col("split_a") != F.col("split_b"))
    )


def split_bounds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """The CANONICAL integer hash bounds for :func:`split_assign` — one
    (name, upper_bound) per split except the last (which takes the rest).
    Exposed so external SQL replays use the exact same integers: cumulative
    fractions are accumulated as exact rationals (``Fraction(str(f))``, so
    0.9 + 0.05 is exactly 0.95, not 0.9500000000000001) before scaling to
    the 60-bit hash space; re-deriving bounds from float addition can land
    a few ulps away and flip membership for hashes inside that window.
    """
    from fractions import Fraction

    total = sum(Fraction(str(f)) for f in fractions.values())
    if total != 1:
        raise ValueError("split fractions must sum to 1")
    names = list(fractions)
    out = []
    cum = Fraction(0)
    for name in names[:-1]:
        cum += Fraction(str(fractions[name]))
        num = cum * (1 << 60)
        out.append((name, int(num) + (1 if num % 1 >= Fraction(1, 2) else 0)))
    return out


def token_accounting(
    df: DataFrame,
    source_col: str = "source",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-source corpus accounting — the report that feeds every
    mixture/temperature decision (:func:`hash_threshold_mixture` takes
    exactly these ``n_tokens`` masses as its weights input): document
    count, token mass, mean document length, and each source's share of
    the corpus token budget. One map-side-combined aggregate (≤ |sources|
    partial rows per task) plus a broadcast of the 1-row corpus total —
    the token arrays are pruned off the scan entirely."""
    per_src = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(n_tok_col).cast("long")).alias("n_tokens"),
    )
    total = per_src.agg(F.sum("n_tokens").alias("__total"))
    return (
        per_src.join(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_len"),
            F.round(F.col("n_tokens") / F.col("__total"), 6).alias("share"),
        )
    )


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    margin: int = 4,
) -> DataFrame:
    """Deterministic exact-``k``-per-group sample: the ``k`` rows of each
    group with the smallest ``md5('gsample~' || id)`` hash — a uniform
    sample that is retry-stable, engine-portable, and frozen per row (a
    doc's membership never flips when OTHER docs arrive, unlike
    rate-based sampling). The eval-set carve-out every training pipeline
    needs ("take 10k docs per source").

    Scale shape (the heavy_hitters two-phase trick): ranking k-of-n with
    a window partitioned by group would funnel each group through ONE
    task — instead a per-group count (tiny dim, broadcast) derives a
    hash cutoff keeping ~``margin*k`` expected survivors, the cutoff
    filters scan-side, and only the survivors (≈margin·k per group) pay
    the per-group rank window. Groups smaller than ``margin*k`` skip the
    filter entirely. The result equals the true k-smallest-hash set
    whenever the cutoff keeps ≥ k rows (probability of shortfall at
    margin 4 is exp(-Θ(k)) by a Chernoff bound); the protocol itself is
    deterministic either way. Adds ``sample_rank`` (1-based)."""
    from pyspark.sql import Window

    from vector_spark.dataprep.dedup import shingle_hash64

    top = F.lit(1 << 60).cast("long")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_g"))
    # ((1<<60) // n_g) * (margin*k) stays < 2^60 exactly when the filter
    # branch is taken (n_g > margin*k) — no 64-bit overflow by design
    dim = counts.select(
        group_col,
        F.when(F.col("__n_g") <= margin * k, top)
        .otherwise(
            # integer DIV, not floor(double /): 2^60/n quotients exceed
            # the 53-bit double mantissa and would round differently
            F.expr(f"{1 << 60} DIV __n_g") * F.lit(margin * k)
        )
        .alias("__cutoff"),
    )
    h = shingle_hash64(
        F.concat(F.lit("gsample~"), F.col(id_col).cast("string"))
    )
    surv = (
        df.withColumn("__h", h)
        .join(F.broadcast(dim), group_col)
        .filter(F.col("__h") < F.col("__cutoff"))
    )
    w = Window.partitionBy(group_col).orderBy("__h", id_col)
    return (
        surv.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__h", "__cutoff")
    )


def curriculum_order(
    df: DataFrame,
    bucket_col: str,
    key_col: str = "doc_id",
    epoch: int = 0,
    sub_buckets: int = 1024,
) -> DataFrame:
    """Curriculum ordering: a global 0-based ``position`` ranking rows by
    (``bucket_col`` asc, per-epoch hash, key) — easy buckets first, a
    fresh reproducible RNG-free shuffle WITHIN each difficulty bucket
    every epoch (pair with :func:`~vector_spark.dataprep.tokens.pow2_bucket`
    for the classic train-short-to-long length curriculum).

    ``bucket_col`` must be small-domain (difficulty tiers, length
    buckets); like :func:`epoch_order` the global rank is two-phase —
    per-(bucket, hash-top-bits) counts make a tiny broadcast offsets dim,
    rows rank inside their sub-bucket only — so there is never a global
    single-task sort, and the offsets frame is ≤ |buckets|·sub_buckets
    rows regardless of corpus size."""
    from pyspark.sql import Window

    from vector_spark.dataprep.dedup import shingle_hash64

    h = shingle_hash64(
        F.concat(F.lit(f"cur{epoch}~"), F.col(key_col).cast("string"))
    )
    shift = (1 << 60) // sub_buckets
    d = df.withColumn("__h", h).withColumn(
        "__sub", F.floor(F.col("__h") / F.lit(shift)).cast("int")
    )
    totals = d.groupBy(bucket_col, "__sub").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy(bucket_col, "__sub").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        bucket_col,
        "__sub",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy(bucket_col, "__sub").orderBy("__h", key_col)
    return (
        d.join(F.broadcast(offsets), [bucket_col, "__sub"])
        .withColumn("position", F.col("__off") + F.row_number().over(w_in) - 1)
        .drop("__sub", "__h", "__off")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    position_col: str = "position",
) -> DataFrame:
    """Round-robin shard assignment over a global training order (the
    ``position`` of :func:`epoch_order` / :func:`curriculum_order`):
    ``shard = position % n_shards``. Balanced to ±1 chunk without ever
    computing a total count, deterministic, and stable — a chunk's shard
    depends only on its own position. Interleaving consecutive positions
    across shards also preserves the training order when shards are
    read round-robin, which blocked (contiguous-range) sharding does
    not without a second pass."""
    return df.withColumn(
        "shard", (F.col(position_col) % n_shards).cast("long")
    )


def bucket_batches(
    df: DataFrame,
    bucket_col: str,
    batch_size: int,
    key_col: str = "doc_id",
    epoch: int = 0,
) -> DataFrame:
    """Materialize the dynamic-batching assignment: within each length/
    difficulty bucket, deal rows into consecutive ``batch_size`` batches
    in a reproducible per-epoch hash order — the concrete batch plan a
    pad-to-bucket loader executes (pair with
    :func:`~vector_spark.dataprep.tokens.pow2_bucket` /
    ``length_histogram`` for the classic same-length batching that
    minimizes padding). Adds ``batch_id`` (0-based within the bucket)
    and ``batch_pos`` (0-based within the batch).

    Scale shape: the within-bucket rank is :func:`curriculum_order`'s
    two-phase plan (per-(bucket, hash-top-bits) windows + broadcast
    offsets — a hot bucket never funnels through one task); the
    bucket-local rank is the global position minus the bucket's first
    position, joined from a tiny per-bucket min-position dim."""
    ordered = curriculum_order(df, bucket_col, key_col=key_col, epoch=epoch)
    starts = ordered.groupBy(bucket_col).agg(
        F.min("position").alias("__start")
    )
    return (
        ordered.join(F.broadcast(starts), bucket_col)
        .withColumn("__r", F.col("position") - F.col("__start"))
        .withColumn("batch_id", F.floor(F.col("__r") / batch_size).cast("long"))
        .withColumn("batch_pos", (F.col("__r") % batch_size).cast("long"))
        .drop("__start", "__r", "position")
    )


def mixture_report(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    alpha: float = 0.5,
    source_col: str = "source",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Target-vs-actual mixture accounting — the check a curation run
    ends with: per source, the actual token share against the target
    share (explicit ``weights``, or the ``w_s = n_s^alpha`` temperature
    rule of :func:`hash_threshold_mixture` when weights are None), with
    the deviation and the resampling factor that would close it. One
    |sources|-row aggregate; everything else is dim math."""
    per = df.groupBy(source_col).agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("n_tokens")
    )
    if weights is None:
        wcol = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    else:
        wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
        wcol = wmap[F.col(source_col)].cast("double")
        per = per.filter(wcol.isNotNull())
    per = per.withColumn("__w", wcol)
    tot = per.agg(
        F.sum("n_tokens").alias("__tn"), F.sum("__w").alias("__tw")
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            source_col,
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("__tn"), 6).alias("actual_share"),
            F.round(F.col("__w") / F.col("__tw"), 6).alias("target_share"),
            F.round(
                F.round(F.col("n_tokens") / F.col("__tn"), 6) * (-1)
                + F.round(F.col("__w") / F.col("__tw"), 6),
                6,
            ).alias("deviation"),
            F.round(
                (F.col("__w") / F.col("__tw"))
                / (F.col("n_tokens") / F.col("__tn")),
                6,
            ).alias("resample_factor"),
        )
    )


def token_budget_trim(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    n_tok_col: str = "n_tok",
    key_col: str = "doc_id",
    salt: str = "budget",
    buckets: int = 1024,
) -> DataFrame:
    """Cap every source at a TOKEN budget: keep the maximal prefix of
    each source's deterministic hash order whose running token total
    stays ≤ ``budget`` — the mixture-weights-in-tokens enforcement step
    (weights say "30B tokens of web, 5B of code"; this op makes a
    concrete, reproducible document set out of that number).

    Returns the kept rows plus ``cum_tokens`` (the running total
    including the row). Membership is frozen per row (hash order, no
    RNG), so retries and re-runs reproduce the same set.

    Scale shape: the running sum is the :func:`epoch_order` two-phase
    trick per source — per-(source, hash-bucket) token totals make a
    broadcastable offsets dim (sources × buckets rows), and only
    within-bucket windows touch data rows; no source ever funnels
    through a single task."""
    from pyspark.sql import Window

    from vector_spark.dataprep.dedup import shingle_hash64

    h = shingle_hash64(
        F.concat(F.lit(f"{salt}~"), F.col(key_col).cast("string"))
    )
    shift = (1 << 60) // buckets
    d = df.withColumn("__h", h).withColumn(
        "__bkt", F.floor(F.col("__h") / F.lit(shift)).cast("int")
    )
    totals = d.groupBy(source_col, "__bkt").agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("__n")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        source_col,
        "__bkt",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy(source_col, "__bkt")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), [source_col, "__bkt"])
        .withColumn(
            "cum_tokens",
            (
                F.col("__off")
                + F.sum(F.col(n_tok_col).cast("long")).over(w_in)
            ).cast("long"),
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("__h", "__bkt", "__off")
    )


def dup_weights(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Soft deduplication: KEEP every near-duplicate but weight each
    document ``1 / |its duplicate cluster|``, so a page crawled N times
    contributes one page's worth of training signal instead of N. Hard
    dropping (exact_dedup, containment_filter) discards provenance and
    formatting diversity along with the redundancy; soft weighting
    preserves the copies for the sampler while normalizing their
    aggregate influence — the tradeoff recent curation pipelines expose
    as a knob next to hard dedup.

    Adds ``cluster_size`` (1 for unique docs) and ``dup_weight``
    (= 1/cluster_size). Plan: connected components over ``pairs``
    (pointer-doubled :func:`~vector_spark.dataprep.dedup.dup_clusters`,
    raises on non-convergence), one per-cluster count aggregate (a dim
    bounded by docs-that-have-a-dup), and a LEFT equi-join back to the
    corpus — AQE broadcasts the dim when small; nothing pairwise."""
    from vector_spark.dataprep.dedup import dup_clusters

    clusters = dup_clusters(pairs, id_a, id_b, max_iters=max_iters)
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("__cn")
    )
    mem = clusters.join(sizes, "cluster").select(
        F.col("member").alias(id_col), F.col("__cn")
    )
    return (
        df.join(mem, id_col, "left")
        .withColumn("cluster_size", F.coalesce(F.col("__cn"), F.lit(1)))
        .withColumn("dup_weight", F.lit(1.0) / F.col("cluster_size"))
        .drop("__cn")
    )
