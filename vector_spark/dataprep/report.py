"""Dataset-card reports: the summary tables a training-data release ships
with (per-source volume, duplication, language mix, tokenizer health).

Beyond-reference training-data ops. Every public corpus release (C4,
RefinedWeb, Dolma) publishes a "datasheet" of per-source statistics; at
100 TB these must come out of the same distributed pass as the pipeline
itself, not a notebook afterthought.

Scale shapes: every report is ONE map-side-combined aggregation over the
corpus (plus a tiny dim-side rollup). Duplicate counting shuffles only
(digest, source) pairs; nothing collects rows to the driver; shares are
ROUND(…, 6) on identical expression shapes so DuckDB replays bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dataset_card(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str | None = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source dataset card: document/char volume, corpus share,
    exact-duplicate rate (md5 digest, within source), and top language
    with its share.

    One pass to (source, digest[, lang]) aggregates; the final rollup
    runs on the source dim. ``dup_frac`` is the share of documents whose
    text digest appeared before them in the same source — the number a
    dedup stage would remove."""
    base = df.select(
        F.col(source_col).alias("__src"),
        F.md5(F.col(text_col)).alias("__dig"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        *( [F.col(lang_col).alias("__lang")] if lang_col else [] ),
    )
    per_digest = base.groupBy("__src", "__dig").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__chars").alias("__c"),
    )
    agg = [
        F.sum("__n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("__n") - F.count(F.lit(1))).cast("long").alias("n_dups"),
        F.sum("__c").cast("long").alias("n_chars"),
    ]
    per_src = per_digest.groupBy("__src").agg(*agg)
    if lang_col:
        lang_counts = base.groupBy("__src", "__lang").agg(
            F.count(F.lit(1)).alias("__ln")
        )
        top_lang = lang_counts.groupBy("__src").agg(
            F.max_by("__lang", F.struct("__ln", "__lang")).alias("top_lang"),
            F.max(F.struct("__ln", "__lang"))["__ln"].alias("__top_n"),
            F.sum("__ln").alias("__tot"),
        )
        per_src = per_src.join(top_lang, "__src")
    tot = per_src.agg(F.sum("n_docs").alias("__all"))
    out = per_src.join(F.broadcast(tot))
    cols = [
        F.col("__src").alias("source"),
        "n_docs",
        "n_distinct",
        "n_dups",
        "n_chars",
        F.round(F.col("n_docs") / F.col("__all"), 6).alias("corpus_share"),
        F.round(F.col("n_dups") / F.col("n_docs"), 6).alias("dup_frac"),
    ]
    if lang_col:
        cols += [
            "top_lang",
            F.round(F.col("__top_n") / F.col("__tot"), 6).alias(
                "top_lang_share"
            ),
        ]
    return out.select(*cols)


def token_fertility(
    df: DataFrame,
    group_col: str = "source",
    n_tok_col: str = "n_tok",
    text_col: str | None = None,
    n_chars_col: str | None = None,
) -> DataFrame:
    """Tokenizer-health report per group: tokens per document, tokens
    per character ("fertility" — a tokenizer mismatched to a source
    produces visibly more tokens per char), and the group's token share
    of the corpus. Pass either ``text_col`` (chars measured here) or a
    precomputed ``n_chars_col``.

    One map-side-combined aggregation; the share join is a broadcast of
    a 1-row total."""
    chars = (
        F.length(F.col(text_col)).cast("long")
        if text_col
        else F.col(n_chars_col).cast("long")
    )
    per = df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(n_tok_col).cast("long")).cast("long").alias("n_tokens"),
        F.sum(chars).cast("long").alias("n_chars"),
    )
    tot = per.agg(F.sum("n_tokens").alias("__all_tok"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "group_key",
            "n_rows",
            "n_tokens",
            "n_chars",
            F.round(F.col("n_tokens") / F.col("n_rows"), 6).alias(
                "tokens_per_row"
            ),
            F.round(
                F.col("n_tokens") / F.greatest(F.col("n_chars"), F.lit(1)), 6
            ).alias("tokens_per_char"),
            F.round(F.col("n_tokens") / F.col("__all_tok"), 6).alias(
                "token_share"
            ),
        )
    )


def source_dup_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair,
    how many distinct text digests appear in BOTH — the "which sources
    copy which" datasheet table (mirror sites, syndication, scraper
    overlap) that decides dedup ordering and mixture weights.

    Plan: dedup to distinct (digest, source) pairs (map-side combined),
    group by digest collecting the source set — bounded by the SOURCE
    CARDINALITY, never by corpus size — then explode the per-digest
    source combinations. The corpus text crosses the wire once as
    digests; no self-join of the pair stream."""
    pairs = df.select(
        F.md5(F.col(text_col)).alias("__dig"),
        F.col(source_col).alias("__src"),
    ).distinct()
    per_dig = pairs.groupBy("__dig").agg(
        F.array_sort(F.collect_set("__src")).alias("__srcs")
    )
    combos = per_dig.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__srcs"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("__srcs"), i + 2,
                            F.greatest(
                                F.size(F.col("__srcs")) - i - 1, F.lit(0)
                            ),
                        ),
                        lambda b: F.struct(
                            a.alias("source_a"), b.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("__p")
    )
    return (
        combos.groupBy(
            F.col("__p.source_a").alias("source_a"),
            F.col("__p.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """What changed between two corpus snapshots: one row per document
    present in either, with status ``added`` (new only), ``removed``
    (old only), ``changed`` (both, different text digest) or
    ``unchanged`` — the crawl-over-crawl diff that drives incremental
    reprocessing (only added+changed re-enter the pipeline).

    Plan: both sides reduce to (id, digest) — the corpus text never
    crosses the wire — and a single full-outer equality join on the id
    produces the status. Deterministic, retry-safe."""
    o = old_df.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("__od")
    )
    n = new_df.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("__nd")
    )
    j = o.join(n, "__id", "full_outer")
    return j.select(
        F.col("__id").alias(id_col),
        F.when(F.col("__od").isNull(), F.lit("added"))
        .when(F.col("__nd").isNull(), F.lit("removed"))
        .when(F.col("__od") != F.col("__nd"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
