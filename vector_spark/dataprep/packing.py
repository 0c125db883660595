"""Training-sequence packing: concat-then-chunk document → sequence
assignment (the standard GPT-style pretraining layout — documents are
concatenated in a fixed order and sliced into fixed-length token windows).

Given per-document token counts and a total order, each document owns the
half-open token interval ``[tok_start, tok_end)`` of the concatenated
stream and therefore spans training chunks ``floor(tok_start/L) ..
floor((tok_end-1)/L)``. Downstream loaders use (chunk_first, chunk_last)
to route documents to shard writers.

Scale shape — the naive plan is a single global window
``SUM(n) OVER (ORDER BY order_col)``: one task sees every row. Instead
the prefix sum is two-phase over a coarse BUCKET of the order column
(≙ the classic distributed scan):

  1. per-bucket totals  — tiny aggregate (one row per bucket)
  2. running offset across buckets — window over the tiny bucket table
  3. broadcast-join offsets back; intra-bucket window runs per bucket

Buckets are value-derived from the order column (deterministic under
retry — no partition ids, no sampling), and each intra-bucket window task
handles ~bucket_size rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    count_col: str,
    seq_len: int,
    order_col: str = "doc_id",
    bucket_size: int = 8192,
) -> DataFrame:
    """Assign each document its token interval and chunk span.

    ``order_col`` must be numeric, unique, and define the concatenation
    order; ``count_col`` is the per-document token count. Adds
    ``tok_start``, ``tok_end``, ``chunk_first``, ``chunk_last`` (chunks of
    ``seq_len`` tokens).
    """
    dt = dict(df.dtypes).get(order_col, "")
    if dt not in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal"):
        # floor(string/N) silently yields null → every row lands in ONE
        # bucket and the "distributed" prefix sum degenerates to a single task
        raise ValueError(f"order_col {order_col!r} must be numeric, got {dt!r}")
    bkt = F.floor(F.col(order_col) / bucket_size).alias("__bkt")
    d = df.withColumn("__bkt", bkt)

    totals = d.groupBy("__bkt").agg(F.sum(count_col).alias("__tot"))
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the bucket table is tiny (rows / bucket_size) — a driver-size window
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off")
    )

    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        d.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.col("__off") + F.sum(count_col).over(w_in))
        .withColumn("tok_end", F.col("__cum"))
        .withColumn("tok_start", F.col("__cum") - F.col(count_col))
        .withColumn("chunk_first", F.floor(F.col("tok_start") / seq_len))
        .withColumn(
            "chunk_last",
            F.floor((F.col("tok_end") - 1) / seq_len),
        )
        .drop("__bkt", "__off", "__cum")
    )
    return out


def pack_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    count_col: str = "n_tok",
    seq_len: int = 512,
    order_col: str = "_i",
    bucket_size: int = 8192,
) -> DataFrame:
    """MATERIALIZE the packed training stream: (chunk_id, tokens, n_fill)
    where chunk ``k`` holds global token positions ``[k·L, (k+1)·L)`` of
    the documents concatenated in ``order_col`` order (the GPT-style
    pretraining layout; the final partial chunk is kept with n_fill < L).

    Plan: ``pack_sequences`` span assignment (two-phase prefix sum, no
    global window) → each doc explodes into one row per chunk it overlaps
    (≤ ceil(len/L)+1 rows) carrying only the SLICE of its tokens inside
    that chunk → one groupBy(chunk_id) assembles slices in offset order
    (array_sort over (offset, piece) structs — offsets are distinct within
    a chunk, so the order is total). The token payload crosses the shuffle
    exactly once, which is the lower bound for a re-layout."""
    spans = pack_sequences(df, count_col, seq_len, order_col, bucket_size)
    # zero-token docs contribute nothing but WOULD emit phantom pieces:
    # their chunk_last (= floor((tok_start-1)/L)) sits BELOW chunk_first
    # and F.sequence descends for start > stop, fabricating empty chunk
    # rows past the stream end when tok_start % L == 0
    spans = spans.filter(F.col(count_col) > 0)
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * seq_len)
    pieces = (
        spans.select(
            F.col(tokens_col),
            "tok_start",
            "tok_end",
            F.explode(
                F.sequence(F.col("chunk_first"), F.col("chunk_last"))
            ).alias("chunk_id"),
        )
        .select(
            "chunk_id",
            (lo - F.col("chunk_id") * seq_len).cast("int").alias("__off"),
            F.slice(
                F.col(tokens_col),
                (lo - F.col("tok_start") + 1).cast("int"),
                (hi - lo).cast("int"),
            ).alias("__piece"),
        )
    )
    return (
        pieces.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__off", "__piece"))
                    ),
                    lambda s: s["__piece"],
                )
            ).alias("tokens")
        )
        .withColumn("n_fill", F.size("tokens").cast("long"))
    )


def pack_token_segments(
    df: DataFrame,
    count_col: str = "n_tok",
    seq_len: int = 512,
    order_col: str = "_i",
    bucket_size: int = 8192,
) -> DataFrame:
    """The document-boundary metadata a trainer needs next to the packed
    stream of :func:`pack_tokens`: per chunk, the ordered lengths of the
    document SEGMENTS inside it (``seg_lens``). Position ids restart at
    each boundary and the block-diagonal attention mask is exactly the
    partition induced by ``seg_lens`` — emitting lengths instead of a
    width×width mask keeps the row O(docs-per-chunk), not O(L²).

    Plan: identical span assignment to :func:`pack_tokens` (two-phase
    prefix sum, no global window) but the explode carries only the
    per-(doc, chunk) OVERLAP LENGTH — integer arithmetic on the span
    bounds — so unlike the materializing packer the token payload never
    crosses the wire at all. ``sum(seg_lens) == n_fill`` of the packed
    chunk by construction."""
    spans = pack_sequences(df, count_col, seq_len, order_col, bucket_size)
    spans = spans.filter(F.col(count_col) > 0)
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * seq_len)
    pieces = spans.select(
        "tok_start",
        "tok_end",
        F.explode(F.sequence(F.col("chunk_first"), F.col("chunk_last"))).alias(
            "chunk_id"
        ),
    ).select(
        "chunk_id",
        (lo - F.col("chunk_id") * seq_len).cast("int").alias("__off"),
        (hi - lo).cast("int").alias("__len"),
    )
    return (
        pieces.groupBy("chunk_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__off", "__len"))),
                lambda s: s["__len"],
            ).alias("seg_lens")
        )
        .select(
            "chunk_id",
            F.size("seg_lens").cast("long").alias("n_segs"),
            "seg_lens",
            F.aggregate(
                "seg_lens", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("n_fill"),
        )
    )
