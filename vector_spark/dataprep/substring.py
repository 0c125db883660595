"""Token-level exact-substring dedup over ``array<int>`` token columns.

The semantics are the exact-substring dedup of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better", the EXACTSUBSTR
variant): any span of ≥ ``k`` tokens that already occurred EARLIER in the
corpus is cut from the later document; the first occurrence keeps its
tokens. "Earlier" is global deterministic (doc_id, position) order, so the
output is retry-stable and engine-reproducible.

The published algorithm builds a suffix array over the concatenated corpus
— inherently sequential and memory-resident, the wrong shape for a
1000-executor cluster. This implementation is the distributed equivalent
used in practice: rolling k-gram hashes (stride 1) + global keep-first.

- **Hashing, not suffix arrays**: each position's k-gram is hashed with TWO
  independent polynomial chains ``(h*B + t) % M`` (int64 multiply-adds in
  whole-stage codegen, bit-exact in any engine with 64-bit integers — the
  same portability contract as text.char_gram_hashes). A false merge needs
  a simultaneous collision in two ~2^50 fields on the same first token:
  ~2^-100 per pair — "exact" at any corpus size that fits in this universe.
- **Shuffle shape**: the corpus tokens NEVER cross the wire. Shuffle #1
  carries (id, pos, h1, h2) per gram position — 32 bytes/position — hash-
  partitioned by gram for the keep-first rank. Shuffle #2 regroups the
  (much smaller) duplicate-occurrence set by doc. At 10^12 sequences ×
  ~136 tokens this is the same volume class as the winnowing fingerprints.
- **No k× blow-up**: duplicate spans are merged into coverage ISLANDS per
  doc with an interval-union window (sort by start, running max of ends)
  instead of exploding each dup gram into its k covered positions —
  coverage cost is O(dup occurrences), not O(k · dup occurrences).
- **Reassembly**: surviving tokens are selected row-side with an indexed
  ``filter`` over the (merged, therefore few) islands — narrow, no
  shuffle.

Reference: the reference engine has no dedup surface (this is a
beyond-reference training-data op per the brief); keep-first semantics
mirror ``dedup.exact_dedup`` / ``dedup.paragraph_dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.functions.objects import let

# Two independent ~2^50 prime fields. Bases stay small (< 2^9) so the
# chained step h*B + t stays < 2^60 — no int64 overflow under ANSI mode
# with token ids < 2^31. TOKEN_HASH_MOD_1 matches text.GRAM_HASH_MOD.
TOKEN_HASH_BASE_1 = 257
TOKEN_HASH_MOD_1 = 1_000_000_000_000_037
TOKEN_HASH_BASE_2 = 263
TOKEN_HASH_MOD_2 = 999_999_999_999_989


def _chain(toks: Column, gp: Column, k: int, base: int, mod: int) -> Column:
    """Polynomial hash of the k-token gram at 1-based position ``gp``:
    left fold of ``h = (h*B + t) % M``, unrolled to k multiply-adds."""
    h = F.element_at(toks, gp)
    for j in range(1, k):
        h = (h * base + F.element_at(toks, gp + j)) % mod
    return h


def token_gram_hashes(tokens: Column, k: int) -> Column:
    """Per-position k-gram hash pairs of an ``array<int>`` token column →
    ``array<struct<h1:long, h2:long>>`` (empty when the doc is shorter
    than ``k``). Bind the result via a let/materialized column — HOF
    recompute caveat, same as text.char_gram_hashes."""
    return let(
        F.transform(tokens, lambda t: t.cast("long")),
        lambda lt: F.when(
            F.size(lt) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(lt) - (k - 1)),
                lambda gp: F.struct(
                    _chain(lt, gp, k, TOKEN_HASH_BASE_1, TOKEN_HASH_MOD_1).alias("h1"),
                    _chain(lt, gp, k, TOKEN_HASH_BASE_2, TOKEN_HASH_MOD_2).alias("h2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<h1:bigint,h2:bigint>>")),
    )


def token_substring_dedup(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """Cut every ≥k-token span already seen earlier in the corpus.

    Returns one row per input doc:
    (id, n_tok, n_grams, n_dup_grams, n_cut, n_kept, kept_digest)
    where ``kept_digest`` is md5 of the comma-joined surviving tokens
    (null when everything was cut). Docs shorter than ``k`` pass through
    whole (n_grams = 0).
    """
    base = df.select(
        F.col(id_col).alias("__id"), F.col(tokens_col).alias("__toks")
    )

    # (doc, gram position, hash pair) — one row per k-gram occurrence.
    occ = base.select(
        "__id",
        F.posexplode(token_gram_hashes(F.col("__toks"), k)).alias("__p0", "__h"),
    ).select(
        "__id",
        (F.col("__p0") + 1).alias("q"),
        F.col("__h.h1").alias("h1"),
        F.col("__h.h2").alias("h2"),
    )

    # Global keep-first: the earliest (doc, pos) occurrence of each gram
    # is canonical; every later occurrence is a duplicate span start.
    w_first = Window.partitionBy("h1", "h2").orderBy("__id", "q")
    dups = (
        occ.withColumn("__rk", F.row_number().over(w_first))
        .where(F.col("__rk") > 1)
        .select("__id", "q", (F.col("q") + (k - 1)).alias("e"))
    )

    # Interval union per doc: merge overlapping/adjacent [q, e] spans into
    # islands (new island when q > running-max(e) + 1).
    w_ord = Window.partitionBy("__id").orderBy("q")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    islands = (
        dups.withColumn("__prev_e", F.max("e").over(w_prev))
        .withColumn(
            "__brk",
            F.when(
                F.col("__prev_e").isNull()
                | (F.col("q") > F.col("__prev_e") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__iid",
            F.sum("__brk").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("__id", "__iid")
        .agg(
            F.min("q").alias("s"),
            F.max("e").alias("e"),
            F.count(F.lit(1)).alias("__n_occ"),
        )
    )
    cover = islands.groupBy("__id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("__isl"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_cut"),
        F.sum("__n_occ").alias("n_dup_grams"),
    )

    joined = base.join(cover, "__id", "left")
    empty_isl = F.array().cast("array<struct<s:int,e:int>>")
    kept = let(
        F.coalesce(F.col("__isl"), empty_isl),
        lambda isl: F.filter(
            F.col("__toks"),
            lambda t, i0: ~F.exists(
                isl, lambda p: (p["s"] <= i0 + 1) & (i0 + 1 <= p["e"])
            ),
        ),
    )
    n_tok = F.size(F.col("__toks"))
    return joined.select(
        F.col("__id").alias(id_col),
        n_tok.cast("long").alias("n_tok"),
        F.greatest(n_tok - (k - 1), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce(F.col("n_cut"), F.lit(0)).cast("long").alias("n_cut"),
        (n_tok - F.coalesce(F.col("n_cut"), F.lit(0))).cast("long").alias("n_kept"),
        let(
            kept,
            lambda kt: F.when(
                F.size(kt) > 0,
                F.md5(F.array_join(F.transform(kt, lambda t: t.cast("string")), ",")),
            ),
        ).alias("kept_digest"),
    )
