"""Deduplication at scale: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes (100 TB posture):
- **exact**: one shuffle on a 16-byte digest (md5 of normalized text), not
  on the text itself — shuffle payload is the digest + id only.
- **MinHash+LSH**: the classic shingle → minhash signature → banded bucket
  join. Signatures/band keys are computed scan-side (narrow); the only
  shuffle is the groupBy on band keys, whose cardinality ≪ rows. Candidate
  pairs then get an exact Jaccard verify on their shingle sets.
- Hash families (both engine-portable, DuckDB oracle recomputes them):
  (a) md5 hex strings seeded by index prefix — lexicographic MIN over md5
  hex values is a uniform min-permutation (`minhash_signature`); (b) the
  FAST int64 family used by `minhash_near_dups`: one md5 per shingle
  truncated to 60 bits, then 16 affine permutations over the 2^31-1 prime
  field — 16 integer ops instead of 16 md5s per shingle, and the exact-
  verify intersections compare longs instead of strings.
- **SimHash**: 16-dim nibble-wise variant over md5 (engine-portable integer
  math; Hamming distance on hex nibbles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.dataprep.text import normalize, words


# --- exact -------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per md5(normalized text)."""
    keyed = df.withColumn("__fp", F.md5(normalize(F.col(text_col))))
    keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(keep, on=["__fp", id_col], how="inner")
        .drop("__fp")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate clusters: fingerprint → count + member ids (diagnostics)."""
    return (
        df.withColumn("fp", F.md5(normalize(F.col(text_col))))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_docs") > 1)
    )


def incremental_dedup(
    new_df: DataFrame,
    store_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against a persisted historical fingerprint store —
    the daily-increment corpus workflow: today's crawl is deduped within
    itself (min-id witness, same rule as :func:`exact_dedup`) and then
    anti-joined against every fingerprint ever admitted.

    Returns ``(kept, new_fingerprints)``: the surviving rows of ``new_df``,
    and their ``(fp, id)`` rows to append to the store for the next run.

    100 TB posture: the store is a 16-byte-digest table, ~1/1000 the corpus
    bytes. Persist it BUCKETED by ``fp`` (`DataFrameWriter.bucketBy`) so the
    anti-join against each new batch is co-located — no store-side shuffle,
    only the (small) batch shuffles into the store's bucketing. The batch
    never carries text through the join: it joins on the digest and
    re-attaches rows by id. Reference parity: dedupe transform's
    seen-fingerprint cache (src/transforms/dedupe/transform.rs:69-139)
    made persistent and exact instead of a 5000-entry LRU.
    """
    keyed = new_df.withColumn("__fp", F.md5(normalize(F.col(text_col))))
    # within-batch: min-id witness per fingerprint (digest+id shuffle only)
    batch_keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    # vs history: drop any fingerprint the store has already admitted
    fresh = batch_keep.join(
        store_df.select(F.col(fp_col).alias("__fp")).distinct(),
        on="__fp",
        how="left_anti",
    )
    kept = keyed.join(fresh, on=["__fp", id_col], how="inner").drop("__fp")
    new_fps = fresh.select(
        F.col("__fp").alias(fp_col), F.col(id_col).alias("first_" + id_col)
    )
    return kept, new_fps


# --- shingles / minhash ------------------------------------------------------


def shingles(col: Column, k: int = 3) -> Column:
    """Distinct word-level k-shingles (space-joined), sorted for
    reproducibility → array<string>."""
    ws = words(col)
    n = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(ws, i, k), " "))
    return F.array_sort(F.array_distinct(sh))


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for seed i, min over shingles of md5(i ~ shingle)
    (hex string order). → array<string> of length num_hashes."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col,
                    lambda s: F.md5(F.concat(F.lit(f"{i}~"), s)),
                )
            )
            for i in range(num_hashes)
        ]
    )


# --- int64 hash family (fast path) ------------------------------------------
# ONE md5 per shingle; the per-seed permutations are affine maps over a
# 2^31-1 prime field ((h·A_i + B_i) mod M — a universal hash family), so a
# 16-hash signature costs 16 integer ops instead of 16 md5s. Engine-
# portable: any SQL engine with md5 + 64-bit ints reproduces it bit-exactly
# (DuckDB mirror in dataprep/oracles.py).

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def affine_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) pairs from an LCG — shared with the oracle."""
    out = []
    for i in range(num_hashes):
        a = (1103515245 * (i + 1) + 12345) % MINHASH_PRIME
        b = (69069 * (i + 1) + 677) % MINHASH_PRIME
        out.append((a or 1, b))
    return out


def shingle_hash64(s: Column) -> Column:
    """shingle string → 60-bit int via the first 15 hex chars of md5
    (F.conv is exact up to 64 bits; 15 nibbles keeps it positive)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hashed_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word-level k-shingles hashed to int64, sorted →
    array<long>. Set semantics are preserved under the (collision-free in
    practice) 60-bit hash, so Jaccard over these equals Jaccard over the
    string shingles — while array_intersect compares longs, not strings."""
    return F.array_sort(
        F.array_distinct(F.transform(shingles(col, k), shingle_hash64))
    )


def minhash_signature_int(hashed_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature over pre-hashed shingles: min of the i-th affine
    permutation per seed. → array<long> of length num_hashes."""
    m = F.lit(MINHASH_PRIME)
    return F.array(
        *[
            F.array_min(
                F.transform(hashed_col, lambda h: (h % m * a + b) % m)
            )
            for a, b in affine_coeffs(num_hashes)
        ]
    )


def lsh_band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: band key b = md5 of the joined band slice.
    Works for string or numeric signatures (elements are cast to string
    before joining). → array<string> of length ``bands``."""
    as_str = F.transform(sig_col, lambda x: x.cast("string"))
    return F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"b{b}~"),
                    F.array_join(
                        F.slice(as_str, b * rows_per_band + 1, rows_per_band),
                        "|",
                    ),
                )
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Plan shape: narrow signature computation → explode band keys → shuffle
    on (band_idx, band_key) only → per-bucket pair generation → verify.
    Dedup of pairs found in multiple bands happens BEFORE the (expensive)
    exact-Jaccard verify.
    """
    return _banded_near_dups(
        df.select(
            F.col(id_col).alias("__id"),
            hashed_shingles(F.col(text_col), k_shingle).alias("__sh"),
        ),
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
    )


def token_ngram_hashes(
    tokens_col: Column, n: int = 8, distinct: bool = True
) -> Column:
    """Distinct sorted hashes of token n-grams over an ``array<int>``
    column — pure integer math end to end (zero md5 / zero strings: the
    BASELINE payload is already tokenized, so shingling is array windowing
    rather than word splitting). Each length-``n`` window folds to
    ``h = fold(acc·1000003 + t) mod MINHASH_PRIME`` (acc stays < 2^51, no
    64-bit overflow). Engine-portable: DuckDB's seeded ``list_reduce``
    equals this fold because ``0·p + t₁ = t₁`` (oracles.token_ngram_
    hashes_expr). Docs shorter than ``n`` tokens yield an empty set and
    are excluded from banding by ``_banded_near_dups`` (an all-NULL
    signature would otherwise band to a constant shared key)."""
    m = F.lit(MINHASH_PRIME)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
        lambda i: F.aggregate(
            F.slice(tokens_col, i, n),
            F.lit(0).cast("long"),
            lambda acc, t: (acc * 1000003 + t) % m,
        ),
    )
    out = F.array_sort(F.array_distinct(grams)) if distinct else grams
    return F.when(F.size(tokens_col) >= n, out).otherwise(
        F.array().cast("array<long>")
    )


def token_minhash_near_dups(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs over TOKEN sequences (the BASELINE
    ``tokens: array<int32>`` payload): same banded plan as
    ``minhash_near_dups`` but the shingle set is integer n-gram hashes —
    no tokenization, no md5 per shingle, whole signature stage is integer
    column math. This is the scale path for dedup of pre-tokenized
    training corpora (the text minhash exists for raw-text corpora)."""
    return _banded_near_dups(
        df.select(
            F.col(id_col).alias("__id"),
            token_ngram_hashes(F.col(tokens_col), n).alias("__sh"),
        ),
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
    )


def _banded_near_dups(
    shingled: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_bucket: int | None,
) -> DataFrame:
    """Shared LSH engine: (__id, __sh: array<long>) → verified near-dup
    pairs. See ``minhash_near_dups`` for the plan-shape discussion.

    Empty shingle sets are excluded from BANDING: an empty set minhashes
    to an all-NULL signature, and ``array_join`` skips nulls, so every
    shingle-less doc would otherwise share the constant band key
    ``md5('b{i}~')`` — one mega-bucket of all short docs, quadratic
    candidate blowup, every pair discarded later by the 0/0-Jaccard
    filter anyway. The exclusion happens AFTER the persist barrier (on
    the materialized ``__sh``): filtering the input expression instead
    lets Catalyst push ``size(<shingle tree>) > 0`` below the projection
    and re-run the whole interpreted shingle tree per row (measured 4×
    on doc_minhash_near_dups). (The DuckDB oracle keeps its candidates
    unfiltered; outputs agree because those pairs never survive verify.)"""
    rows_per_band = num_hashes // bands
    # each step materializes its own column: passing the signature EXPRESSION
    # into the band builder would duplicate the whole tree per band key, and
    # higher-order-function expressions run interpreted (no codegen subexpr
    # elimination) — measured 10× slowdown when inlined
    base = (
        shingled
        .withColumn("__sig", minhash_signature_int(F.col("__sh"), num_hashes))
        .withColumn("__bands", lsh_band_keys(F.col("__sig"), bands, rows_per_band))
        .persist()
    )
    # persist = the classic LSH materialization step: the signature table is
    # computed ONCE and reused by both sides of the bucket self-join and the
    # verify joins. Without the barrier, Catalyst inlines the interpreted
    # HOF tree into the generate/join nodes and recomputes it per use
    # (measured 10-20× slowdown). At the 10^12 tier this table is WRITTEN
    # (parquet/Iceberg) rather than cached — same shape, durable.
    # candidate pairs on IDS ONLY — the heavy shingle arrays stay out of the
    # self-join shuffle; dedupe multi-band pairs BEFORE fetching shingles
    banded = base.filter(F.size("__sh") > 0).select(
        "__id", F.posexplode("__bands").alias("__b", "__key")
    )
    if max_bucket is not None:
        # LSH's known failure mode: boilerplate text forms mega-buckets with
        # quadratic pair blowup. Cap bucket size and REPORT the drop —
        # silent truncation would read as full coverage (SCALING.md).
        sizes = banded.groupBy("__b", "__key").count()
        dropped = sizes.filter(F.col("count") > max_bucket)
        n_dropped = dropped.count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_near_dups: dropping %d bucket(s) larger than %d "
                "(boilerplate-heavy keys); pairs within them are NOT checked",
                n_dropped, max_bucket,
            )
            banded = banded.join(
                dropped.select("__b", "__key"), on=["__b", "__key"],
                how="left_anti",
            )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            on=[
                F.col("l.__b") == F.col("r.__b"),
                F.col("l.__key") == F.col("r.__key"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    shing = base.select("__id", "__sh")
    verified = (
        pairs.join(shing.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sha"), on="id_a")
        .join(shing.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__shb"), on="id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("__sha"), F.col("__shb")), 4))
    )
    return (
        verified.filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over the near-dup pair graph → (member, cluster)
    with cluster = min member id (the canonical representative to KEEP).

    Iterative min-label propagation WITH pointer-doubling: each round a
    node first adopts the smallest label in its neighborhood, then adopts
    its label's label (``label[v] = min(label[v], label[label[v]])`` —
    valid because labels are always node ids). The shortcut halves the
    remaining distance to the component minimum each round, so fixpoint
    is reached in O(log diameter) rounds (plain neighborhood propagation
    alone is O(diameter)). Each round is a constant number of shuffles on
    node id; the fixpoint check is a changed-count action. Chains
    (a-b, b-c) converge to one cluster even though a-c was never a
    candidate pair. Driver loop is per-ROUND, not per-row (stays
    distributed).

    Raises ``RuntimeError`` if the labels have not converged after
    ``max_iters`` rounds — a silent early exit would hand callers like
    :func:`~vector_spark.dataprep.mixing.leakage_safe_split` components
    with inconsistent representatives, which is exactly the cross-split
    leakage that function exists to prevent. With the shortcut, the
    default 20 rounds covers component diameters up to ~2^20.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()  # truncate lineage each round — iterative plans
        # otherwise deepen every iteration and analysis time explodes
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
        )
        # pointer doubling: labels are node ids, so label's OWN label is
        # a (weakly smaller) member of the same component — adopting it
        # halves the hop distance to the component min every round
        parent = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(parent, stepped.label == parent.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters: labels did not converge within {max_iters} "
            f"rounds - component diameter exceeds 2^{max_iters}; raise "
            f"max_iters"
        )
    return labels.select(F.col("node").alias("member"), F.col("label").alias("cluster"))


# --- simhash -----------------------------------------------------------------


def simhash_hex(col: Column, bits: int = 16) -> Column:
    """Nibble-wise SimHash over word features → ``bits``-length hex string.

    For each of ``bits`` positions p, take nibble p of md5(word) per word,
    sum (nibble*2-15) (maps 0..15 → −15..+15), emit 'f' if the sum > 0 else
    '0'. Portable integer math (the oracle reproduces it exactly); Hamming
    similarity = matching positions.

    Single-pass: one md5 per word → per-word nibble vector → element-wise
    fold (``zip_with`` add). One evaluation of the word array total —
    per-bit aggregates would re-evaluate the interpreted HOF tree ``bits``
    times (see minhash_near_dups persist note).
    """
    ws = F.array_distinct(words(col))
    pos = F.sequence(F.lit(1), F.lit(bits))
    hashed = F.transform(ws, lambda w: F.md5(w))  # one md5 per word
    contrib = F.transform(
        hashed,
        lambda h: F.transform(
            pos, lambda p: F.conv(h.substr(p, F.lit(1)), 16, 10).cast("int") * 2 - 15
        ),
    )
    zeros = F.transform(pos, lambda p: F.lit(0))
    sums = F.aggregate(
        contrib, zeros, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )
    return F.array_join(
        F.transform(sums, lambda n: F.when(n > 0, F.lit("f")).otherwise(F.lit("0"))),
        "",
    )


def simhash_hamming(a: Column, b: Column, bits: int = 16) -> Column:
    """Number of differing positions between two simhash hex strings."""
    diff = F.lit(0)
    for p in range(bits):
        diff = diff + (a.substr(p + 1, 1) != b.substr(p + 1, 1)).cast("int")
    return diff


# --- n-gram jaccard (direct, for candidate pairs) ---------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    bucket_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.5,
    bucket_cap: int | None = 2000,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs within a pre-bucketed candidate
    group (e.g. same source/lang bucket). The bucket join bounds the
    quadratic blowup; use minhash_near_dups when no natural bucket exists.

    Scale guards (pairs grow quadratically with bucket size, so a natural
    bucket alone does NOT survive 100×):

    - ``bucket_cap``: buckets holding more than this many docs are
      EXCLUDED (and logged) — route them through ``minhash_near_dups``,
      whose banded candidates stay near-linear. Deterministic (a pure
      count predicate), so an external SQL oracle mirrors it exactly.
    - size-ratio pruning inside the join condition: J(A,B) ≥ t implies
      t·|A| ≤ |B| ≤ |A|/t, so shingle-count bands prune impossible pairs
      BEFORE the set-intersection runs. Pure pruning — never changes the
      result, oracle needs no mirror.
    """
    base = df.select(
        F.col(bucket_col).alias("__bk"),
        F.col(id_col).alias("__id"),
        hashed_shingles(F.col(text_col), k_shingle).alias("__sh"),
    ).withColumn("__n", F.size("__sh"))
    if bucket_cap is not None:
        counts = base.groupBy("__bk").agg(F.count(F.lit(1)).alias("__bn"))
        import logging

        log = logging.getLogger(__name__)
        big = counts.filter(F.col("__bn") > bucket_cap)
        for row in big.collect():  # tiny frame: one row per mega-bucket
            log.warning(
                "ngram_jaccard: bucket %r has %d docs > cap %d — excluded "
                "(route it through minhash_near_dups)",
                row.__bk, row.__bn, bucket_cap,
            )
        base = base.join(
            F.broadcast(counts.filter(F.col("__bn") <= bucket_cap)), "__bk"
        ).drop("__bn")
    base = base.persist()  # shingle table computed once, read by both sides
    t = F.lit(float(threshold))
    return (
        base.alias("l")
        .join(
            base.alias("r"),
            on=[
                F.col("l.__bk") == F.col("r.__bk"),
                F.col("l.__id") < F.col("r.__id"),
                # exact length-ratio prune implied by jaccard >= t
                F.col("r.__n") >= t * F.col("l.__n"),
                F.col("l.__n") >= t * F.col("r.__n"),
            ],
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.round(jaccard(F.col("l.__sh"), F.col("r.__sh")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- winnowing near-dups (fingerprint equi-join) ----------------------------


def winnow_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    min_shared: int = 8,
    fp_cap: int = 50,
    strategy: str = "pandas",
) -> DataFrame:
    """Near-duplicate pairs via winnowing fingerprints (text.winnow): two
    documents sharing any substring of length ≥ k+w−1 share a fingerprint,
    so candidate generation is an EQUI-JOIN on exploded fingerprints —
    never a pairwise scan. Returns (id_a, id_b, shared) with
    ``shared`` = number of common selected fingerprints ≥ ``min_shared``.

    Scale guards (same shape as the minhash band join):

    - ``fp_cap``: fingerprints appearing in more than ``fp_cap`` documents
      are dropped before pairing (boilerplate/stop-fingerprints — a
      fingerprint shared by B docs generates B² pairs). Deterministic
      count predicate, mirrored exactly by the SQL oracle.
    - the join carries (id, fp) longs only; texts are never shuffled.
    """
    from vector_spark.dataprep import text as tx

    fps = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        .withColumn("__norm", tx.normalize(F.col(text_col)))
        .withColumn(
            "__fps", tx.winnow_fingerprints(F.col("__norm"), k=k, w=w,
                                            strategy=strategy)
        )
        .select("__id", F.explode("__fps").alias("__fp"))
        # persist: the hash chain is the expensive leg and feeds BOTH the
        # stop-fingerprint count and the pruning join — without this it
        # would be evaluated twice (at scale: a second full corpus scan).
        .persist()
    )
    ok = F.count(F.lit(1)).alias("__n")
    keep = fps.groupBy("__fp").agg(ok).filter(F.col("__n") <= fp_cap)
    pruned = fps.join(keep.select("__fp"), "__fp").persist()
    pairs = (
        pruned.alias("l")
        .join(
            pruned.alias("r"),
            on=[
                F.col("l.__fp") == F.col("r.__fp"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .groupBy(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return pairs


def winnow_containment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    min_ratio: float = 0.7,
    min_fps: int = 4,
    fp_cap: int = 100,
    strategy: str = "pandas",
) -> DataFrame:
    """ASYMMETRIC containment detection: the fraction of the smaller
    document's winnowing fingerprints that appear in the larger one —
    a tweet quoted inside a long article scores ratio ≈ 1 even though
    pairwise Jaccard similarity is tiny, which is why near-dup passes
    (:func:`winnow_near_dups`, minhash) cannot find quotes, mirrored
    boilerplate, or wholesale article inclusion.

    Returns ``(id_small, id_big, n_small, shared, ratio)`` with
    ``ratio = shared / n_small ≥ min_ratio`` and ``n_small ≥ min_fps``
    (tiny docs produce too few fingerprints to claim containment).
    Direction is by DISCRIMINATIVE fingerprint count (ties → lower id is
    the small side), so the pair is reported once.

    Both sides of the ratio count DISCRIMINATIVE fingerprints only —
    stop-fingerprints (in > ``fp_cap`` docs: sitewide boilerplate,
    ubiquitous phrases) are excluded from the denominator as well as the
    numerator. With an unpruned denominator a boilerplate-heavy corpus
    (most of the real web) systematically under-detects: a page that is
    30% shared chrome has 30% of its fps capped out of ``shared`` but
    still diluting ``n_small``, dragging true quote-containment under
    the threshold. This is the stop-gram/IDF treatment standard in
    dedup pipelines.

    Plan: identical candidate shape to winnow_near_dups — explode
    DISTINCT fingerprints, drop stop-fingerprints (> fp_cap docs),
    equi-join on the fingerprint, count shared per pair — never a
    pairwise scan; texts never shuffle. The per-doc fingerprint-count
    dim joins back by id (two broadcast-or-shuffle equi-joins on id)."""
    from vector_spark.dataprep import text as tx

    fps = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        .withColumn("__norm", tx.normalize(F.col(text_col)))
        .withColumn(
            "__fps",
            tx.winnow_fingerprints(F.col("__norm"), k=k, w=w,
                                   strategy=strategy),
        )
        .select("__id", F.explode("__fps").alias("__fp"))
        .distinct()
        .persist()
    )
    keep = fps.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("__n")
    ).filter(F.col("__n") <= fp_cap)
    pruned = fps.join(keep.select("__fp"), "__fp").persist()
    # sizes over PRUNED fps: the ratio is containment among
    # discriminative fingerprints (see docstring)
    sizes = pruned.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("__nf")
    )
    shared = (
        pruned.alias("l")
        .join(
            pruned.alias("r"),
            on=[
                F.col("l.__fp") == F.col("r.__fp"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .groupBy(F.col("l.__id").alias("__a"), F.col("r.__id").alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    j = (
        shared.join(
            sizes.select(F.col("__id").alias("__a"),
                         F.col("__nf").alias("__na")), "__a")
        .join(
            sizes.select(F.col("__id").alias("__b"),
                         F.col("__nf").alias("__nb")), "__b")
    )
    small_is_a = (F.col("__na") < F.col("__nb")) | (
        (F.col("__na") == F.col("__nb")) & (F.col("__a") < F.col("__b"))
    )
    out = j.select(
        F.when(small_is_a, F.col("__a")).otherwise(F.col("__b"))
        .alias("id_small"),
        F.when(small_is_a, F.col("__b")).otherwise(F.col("__a"))
        .alias("id_big"),
        F.when(small_is_a, F.col("__na")).otherwise(F.col("__nb"))
        .alias("n_small"),
        "shared",
    )
    return out.withColumn(
        "ratio", F.round(F.col("shared") / F.col("n_small"), 6)
    ).filter(
        (F.col("ratio") >= min_ratio) & (F.col("n_small") >= min_fps)
    )


def containment_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The ACTION for :func:`winnow_containment`: drop every document
    that is contained in a larger one (the larger doc carries all the
    contained text already — keeping both double-counts the content in
    training). One anti-join of the corpus against the contained-id
    dim; kwargs pass through to winnow_containment."""
    contained = winnow_containment(
        df, text_col=text_col, id_col=id_col, **kwargs
    ).select(F.col("id_small").alias(id_col)).distinct()
    return df.join(contained, id_col, "left_anti")


# --- segment-level (paragraph) dedup ----------------------------------------


def segment_chunks(col: Column, seg_words: int = 10) -> Column:
    """Fixed-width word segments of ``col`` → array<string>.

    Stand-in for paragraph splitting (CCNet splits on newline; the synth
    corpus has none, so segmentation is every ``seg_words`` words — the
    dedup machinery downstream is delimiter-agnostic). The last segment
    may be shorter; ``slice`` clamps in both engines.
    """
    ws = F.split(col, " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(seg_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.slice(ws, i * seg_words + F.lit(1), F.lit(seg_words))
        ),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
) -> DataFrame:
    """Sub-document (paragraph/segment-level) exact dedup, CCNet-style
    (≙ the dedup stage of CCNet/RefinedWeb: hash every paragraph, keep the
    FIRST occurrence corpus-wide, reassemble documents from surviving
    paragraphs).

    Returns (id, n_segs, n_kept, text_digest) where text_digest is
    md5 of the reassembled text (null when every segment was a dup).

    Plan shape / 100 TB posture: segments explode scan-side (narrow);
    shuffle #1 hash-partitions segments by md5(segment) for the
    keep-first rank — the canonical CCNet shape (the corpus text volume
    crosses the wire once, unavoidable since surviving text must be
    reassembled); shuffle #2 regroups by doc id. First-occurrence order
    is (doc_id, position) — deterministic under retries, reproducible by
    any engine.
    """
    seg = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(segment_chunks(F.col(text_col), seg_words)).alias(
            "__pos", "__seg"
        ),
    )
    w = Window.partitionBy(F.md5(F.col("__seg"))).orderBy("__id", "__pos")
    ranked = seg.withColumn("__rk", F.row_number().over(w))
    kept = F.when(F.col("__rk") == 1, F.struct("__pos", "__seg"))
    out = ranked.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.count(kept).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["__seg"]
            ),
        ).alias("__txt"),
    )
    return out.select(
        F.col("__id").alias(id_col),
        "n_segs",
        "n_kept",
        F.when(F.col("n_kept") > 0, F.md5(F.col("__txt"))).alias(
            "text_digest"
        ),
    )


# --- cluster representative selection ---------------------------------------


def cluster_representatives(
    df: DataFrame,
    clusters: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    member_col: str = "member",
    cluster_col: str = "cluster",
) -> DataFrame:
    """The KEEP side of near-dup dedup: one representative per cluster —
    highest ``quality_col``, id as the deterministic tie-break; documents
    in no cluster represent themselves (singleton cluster = own id).

    ``clusters`` is (member, cluster) from :func:`dup_clusters`. Returns
    ``df``'s surviving rows plus the ``cluster`` label.

    Scale: the label join is small-side (clusters ≈ dup members only —
    broadcast when it fits); the argmax is a per-cluster window rank,
    one shuffle on the cluster key (skew-bounded: dup clusters are
    typically 2–50 docs).
    """
    lab = clusters.select(
        F.col(member_col).alias(id_col), F.col(cluster_col).alias("__c")
    )
    j = df.join(F.broadcast(lab), on=id_col, how="left").withColumn(
        "__c", F.coalesce(F.col("__c"), F.col(id_col))
    )
    w = Window.partitionBy("__c").orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    return (
        j.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .withColumnRenamed("__c", cluster_col)
    )


def lsh_plan(
    threshold: float,
    max_hashes: int = 256,
) -> dict:
    """Plan MinHash-LSH parameters for a target Jaccard ``threshold``:
    choose (bands b, rows-per-band r) with b·r ≤ ``max_hashes``
    minimizing |t* − threshold| where t* = (1/b)^(1/r) is the S-curve
    midpoint (Leskovec/Rajaraman/Ullman, MMDS §3.4). Returns the chosen
    (bands, rows_per_band, num_hashes, t_star) plus the collision
    probabilities P(candidate | s) = 1 − (1 − s^r)^b at s = threshold
    and at ±0.1 around it — the false-positive / false-negative posture
    the cap-and-verify stages will actually see. Driver-side planning
    math only; feed the result into ``minhash_signature_int`` +
    ``lsh_band_keys``."""
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    if max_hashes < 2:
        raise ValueError("max_hashes must be >= 2")
    best = None
    for r in range(1, max_hashes + 1):
        b = max_hashes // r
        if b < 1:
            break
        t_star = (1.0 / b) ** (1.0 / r)
        cand = (abs(t_star - threshold), r, b)
        if best is None or cand < best:
            best = cand
    _, r, b = best

    def p_cand(s: float) -> float:
        return 1.0 - (1.0 - s ** r) ** b

    return {
        "bands": b,
        "rows_per_band": r,
        "num_hashes": b * r,
        "t_star": (1.0 / b) ** (1.0 / r),
        "p_at_threshold": p_cand(threshold),
        "p_below": p_cand(max(threshold - 0.1, 0.0)),
        "p_above": p_cand(min(threshold + 0.1, 1.0)),
    }


def token_exact_dedup(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup DIRECTLY on the token payload: fingerprint =
    md5 of the comma-joined token ids (content-exact — no normalization
    question exists at token level), keep the min-id representative per
    fingerprint. The shuffle carries (16-byte digest, id) pairs only —
    the token arrays never leave their rows, so the plan is identical at
    10^12 sequences (same scale posture as the text `exact_dedup`)."""
    fp = F.md5(
        F.concat_ws(",", F.transform(F.col(tokens_col), lambda t: t.cast("string")))
    )
    keyed = df.withColumn("__fp", fp)
    keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, on=["__fp", id_col], how="inner").drop("__fp")


# --- incremental NEAR-dup: new batch vs a persisted LSH index ---------------


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The persisted LSH index of a corpus: one row per (doc, band) with
    the band key AND the full minhash signature — what an incremental
    ingestion run stores between batches (the near-dup twin of
    :func:`incremental_dedup`'s exact-digest ledger). ``bands × docs``
    rows of (id, band_idx, band_key, sig); signatures are ``num_hashes``
    longs, so the index is a few hundred bytes per document regardless
    of document size."""
    rows_per_band = num_hashes // bands
    # same two traps _banded_near_dups documents: (1) each HOF step gets
    # its own materialized column + a persist barrier, else Catalyst
    # inlines the interpreted signature tree into every downstream use
    # (measured 10-20×); (2) empty shingle sets are EXCLUDED — they
    # minhash to all-NULL signatures whose constant band key forms one
    # mega-bucket of every short doc (quadratic candidates, all
    # discarded later by the null-similarity filter anyway).
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            hashed_shingles(F.col(text_col), k_shingle).alias("__sh"),
        )
        .persist()
        .filter(F.size("__sh") > 0)
        .withColumn("sig", minhash_signature_int(F.col("__sh"), num_hashes))
        .withColumn(
            "__bands", lsh_band_keys(F.col("sig"), bands, rows_per_band)
        )
        .persist()
    )
    return base.select(
        "doc_id",
        "sig",
        F.posexplode("__bands").alias("band_idx", "band_key"),
    )


def sig_similarity(a: Column, b: Column, num_hashes: int) -> Column:
    """MinHash signature similarity: the share of equal components — the
    standard unbiased Jaccard estimator (Broder), exact-arithmetic and
    engine-portable (no float hashing)."""
    eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
    return F.round(
        F.aggregate(eq, F.lit(0), lambda acc, x: acc + x)
        / F.lit(num_hashes),
        4,
    )


def incremental_minhash_dedup(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> dict[str, DataFrame]:
    """Match a NEW batch of documents against the EXISTING corpus's LSH
    index without touching the old corpus text: band the new docs, join
    band keys against the index (equality join on (band_idx, band_key) —
    the only shuffle, carrying band rows, never documents), and score
    candidates by signature similarity.

    Returns ``{"matches": (doc_id, matched_id, sig_sim), "index":
    the new batch's index rows}`` — append ``index`` to the store and
    drop/flag ``matches`` ids to complete the incremental step. A new
    doc matching several stored docs reports its best match
    (deterministic: max similarity, ties to smallest matched_id)."""
    new_idx = minhash_index(
        new_df, text_col, id_col, k_shingle, num_hashes, bands
    )
    # collapse both sides to DISTINCT signatures before the band join:
    # exact-dup clusters (the dominant bucket blow-up — thousands of
    # identical docs share one signature) become single rows, and the
    # result is unchanged: identical signatures score identically, and
    # the min-id representative per old signature is exactly the id the
    # (sim DESC, id ASC) best-match tie-break would pick.
    old_sig = index.groupBy(
        F.col("sig").alias("__old_sig"),
        "band_idx",
        F.col("band_key").alias("__old_key"),
    ).agg(F.min("doc_id").alias("__old_id"))
    new_sig = new_idx.groupBy("sig", "band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("__n")
    )
    cand = (
        new_sig.join(
            old_sig,
            (new_sig["band_idx"] == old_sig["band_idx"])
            & (new_sig["band_key"] == old_sig["__old_key"]),
        )
        .select("sig", "__old_id", "__old_sig")
        .distinct()
    )
    scored = cand.select(
        "sig",
        F.col("__old_id").alias("matched_id"),
        sig_similarity(F.col("sig"), F.col("__old_sig"), num_hashes).alias(
            "sig_sim"
        ),
    ).filter(F.col("sig_sim") >= threshold)
    # best match = max similarity, ties to SMALLEST matched id — two
    # aggregates on the candidate dim (id types may be strings, so a
    # numeric negation tie-break inside one max_by is not portable)
    top = scored.groupBy("sig").agg(F.max("sig_sim").alias("sig_sim"))
    best_per_sig = (
        scored.join(top, ["sig", "sig_sim"])
        .groupBy("sig", "sig_sim")
        .agg(F.min("matched_id").alias("matched_id"))
    )
    matches = (
        new_idx.filter(F.col("band_idx") == 0)
        .select("doc_id", "sig")
        .join(best_per_sig, "sig")
        .select("doc_id", "matched_id", "sig_sim")
    )
    return {"matches": matches, "index": new_idx}


# --- Bloom-prefiltered incremental dedup ------------------------------------
#
# At the 10^12 tier the exact anti-join of every new batch against the
# full fingerprint ledger shuffles the BATCH into the ledger's bucketing
# (incremental_dedup's posture). A Bloom prefilter removes even that:
# the ledger compresses to a broadcastable bit array (built with ONE
# map-side-combined aggregation), definitely-new rows skip the join
# entirely, and only might-contain candidates (true dups + fpp noise)
# pay the exact confirm join. The result is EXACT — the bloom only
# routes rows. From-scratch pure column math (no spark bloom SQL
# functions are exposed to pyspark): k affine rehashes of the shared
# md5-based hash64, bit_or-folded into 64-bit words, membership tested
# with shift/mask expressions — every step engine-portable, so the
# DuckDB oracle can replay even the bloom itself.


def _bloom_positions(key: Column, num_bits: int, num_hashes: int) -> list:
    h = shingle_hash64(key)
    return [
        ((h % F.lit(MINHASH_PRIME) * a + b) % F.lit(MINHASH_PRIME))
        % F.lit(num_bits)
        for a, b in affine_coeffs(num_hashes)
    ]


def bloom_words_df(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom bit array over ``df[key_col]`` as a ``(w int, m long)``
    DIM of set words — at most ``num_bits/64`` rows, bounded by
    ``num_bits``, never by ledger size. Build is one explode (k rows
    per key) + groupBy(word) bit_or. Keeping the words as a DataFrame
    (not a collected literal) is what lets the membership probe be a
    broadcast hash join with an O(1)-size plan — a million-word filter
    embedded as an array LITERAL costs the optimizer/codegen seconds
    per query and caps num_bits at what a plan can hold."""
    pos = _bloom_positions(F.col(key_col), num_bits, num_hashes)
    entries = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (p / 64).cast("int").alias("w"),
                        F.call_function(
                            "shiftleft",
                            F.lit(1).cast("long"),
                            (p % 64).cast("int"),
                        ).alias("m"),
                    )
                    for p in pos
                ]
            )
        ).alias("e")
    )
    return entries.groupBy(F.col("e.w").alias("w")).agg(
        F.bit_or("e.m").alias("m")
    )


def build_bloom_words(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> list[int]:
    """:func:`bloom_words_df` collected to a driver-side dense list for
    the pure-column-math membership test (:func:`bloom_might_contain`)
    — use only for SMALL filters (≲2^16 bits) where a literal in the
    plan is fine; the scale path is the words-dim broadcast join inside
    :func:`bloom_incremental_dedup`."""
    n_words = num_bits // 64
    rows = bloom_words_df(df, key_col, num_bits, num_hashes).collect()
    words = [0] * n_words
    for r in rows:
        words[r.w] = r.m
    return words


def bloom_might_contain(
    key: Column, words: list[int], num_hashes: int = 4
) -> Column:
    """Membership test against a broadcast word list — pure shift/mask
    column math (zero false negatives by construction)."""
    num_bits = len(words) * 64
    arr = F.lit(words)
    h = shingle_hash64(key)
    conds = []
    for a, b in affine_coeffs(num_hashes):
        p = ((h % F.lit(MINHASH_PRIME) * a + b) % F.lit(MINHASH_PRIME)) % F.lit(
            num_bits
        )
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        # unsigned shift (an arithmetic shift would sign-extend the
        # sign bit, an ordinary bloom bit) and bitwise AND (a `% 2` of
        # a still-negative odd word is -1, not 1)
        bit = F.call_function(
            "shiftrightunsigned", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        conds.append(bit == 1)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_incremental_dedup(
    new_df: DataFrame,
    store_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fp",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """:func:`incremental_dedup` with the history anti-join Bloom-
    prefiltered: rows whose fingerprint the bloom rejects are DEFINITELY
    new (no join at all); only might-contain candidates confirm against
    the store. Identical exact semantics and return shape —
    ``(kept, new_fingerprints)``.

    The membership probe is ``num_hashes`` hash joins of the batch
    against the set-words dim (w → word), one per hash — plan size
    O(num_hashes), bloom bits living in DATA rather than in the query
    plan. That is what lets num_bits grow to billions on a cluster: the
    explicit broadcast hint is only applied while the dim is provably
    small (``num_bits`` ≤ 2^26 → ≤1M rows ≈ 16 MB); past that the joins
    are left unhinted so AQE picks broadcast vs shuffle from the dim's
    actual size instead of force-broadcasting a multi-hundred-MB array
    (``F.broadcast`` is honored regardless of
    autoBroadcastJoinThreshold, so an unconditional hint would OOM at
    the very scale this rewrite exists for). The dim is localCheckpoint-
    materialized once so the full-ledger build aggregation cannot be
    re-evaluated per hash join. The old collected-literal probe cost the
    optimizer ~10 s per query at 2^20 bits and could never scale."""
    keyed = new_df.withColumn("__fp", F.md5(normalize(F.col(text_col))))
    batch_keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    wdim = bloom_words_df(
        store_df.select(F.col(fp_col)), fp_col, num_bits, num_hashes
    ).localCheckpoint()
    # ≤1M-row (w, m) dim → ~16 MB: safe to force-broadcast. Larger blooms
    # must not carry the hint — let AQE decide from the materialized size.
    hint = F.broadcast if num_bits <= (1 << 26) else (lambda d: d)
    pos = _bloom_positions(F.col("__fp"), num_bits, num_hashes)
    probed = batch_keep
    hit_cols = []
    for i, p in enumerate(pos):
        probed = probed.withColumn(
            f"__w{i}", (p / 64).cast("int")
        ).withColumn(
            f"__m{i}",
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
            ),
        )
        probed = probed.join(
            hint(
                wdim.select(
                    F.col("w").alias(f"__w{i}"), F.col("m").alias(f"__wm{i}")
                )
            ),
            f"__w{i}",
            "left",
        )
        hit_cols.append(
            F.coalesce(
                F.col(f"__wm{i}").bitwiseAND(F.col(f"__m{i}")) != 0,
                F.lit(False),
            )
        )
    might = hit_cols[0]
    for c in hit_cols[1:]:
        might = might & c
    probed = probed.select("__fp", id_col, might.alias("__might"))
    definite = probed.filter(~F.col("__might")).drop("__might")
    confirmed = probed.filter(F.col("__might")).drop("__might").join(
        store_df.select(F.col(fp_col).alias("__fp")).distinct(),
        on="__fp",
        how="left_anti",
    )
    fresh = definite.unionByName(confirmed)
    kept = keyed.join(fresh, on=["__fp", id_col], how="inner").drop("__fp")
    new_fps = fresh.select(
        F.col("__fp").alias(fp_col), F.col(id_col).alias("first_" + id_col)
    )
    return kept, new_fps
