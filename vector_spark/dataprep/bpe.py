"""Byte-pair-encoding tokenizer: train + apply over a document corpus.

The missing piece between the raw ``documents`` table and the BASELINE
``tokens`` payload (`doc_id, tokens:array<int>`): everything downstream
(packing, substring dedup, vocab stats, LM scoring) consumes token arrays;
this module produces them from text with a corpus-trained subword vocab
(Sennrich et al. 2016, ACL — the public BPE algorithm every GPT-style
tokenizer derives from).

Spark-first split of work (the same split HuggingFace ``tokenizers`` uses,
re-expressed distributed):

- **corpus-scale work is one aggregation**: :func:`word_counts` — the only
  pass over the full text volume. At 100 TB this is a map-side-combined
  groupBy over words (zipf: distinct words ≪ word occurrences).
- **training state is O(vocab), driver-side**: :func:`bpe_train` runs the
  merge loop over the collected (word, count) dim — bounded by ``top_v``
  (capped TakeOrdered collect, the enrichment-dim pattern). Words outside
  the cap still encode fine at apply time (BPE falls back to characters).
- **apply tokenizes the DISTINCT-WORD dim, not the corpus**:
  :func:`bpe_encode` encodes each distinct word once (vectorized over the
  dim in a pandas UDF — per-word merge application is inherently
  sequential, but the dim is zipf-small), broadcast-joins word→ids onto
  exploded corpus positions, and reassembles per doc. Corpus text crosses
  the wire once (the paragraph_dedup shape).

Determinism: merge selection ties break by (count DESC, pair ASC) — the
training result is a pure function of the word-count multiset, so any
engine/partitioning reproduces the identical merge list (pytest pins
parity with an independent pure-Python reference implementation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataprep import text as tx

END = "</w>"  # end-of-word marker (Sennrich §3.2) — keeps merges from
# crossing word boundaries and makes decode unambiguous


def word_counts(df: DataFrame, text_col: str = "text",
                top_v: int | None = 50_000) -> DataFrame:
    """(word, n) over the normalized corpus — THE corpus-scale pass.
    ``top_v`` caps the dim via distributed TakeOrdered (ties: word ASC).
    The cap is the contract: downstream ``bpe_train`` collects this dim
    to the driver, so the DEFAULT is a 50k cap (plenty for any merge
    budget — Sennrich trains on the top tens of thousands). Passing
    ``top_v=None`` is an explicit opt-out for small-corpus parity
    checks, never the implicit path."""
    w = (
        df.select(F.explode(tx.words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_v is not None:
        w = w.orderBy(F.col("n").desc(), F.col("word")).limit(top_v)
    return w


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,) if word else ()


def bpe_train(wc: DataFrame | list[tuple[str, int]],
              num_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE merge-list training over a (word, n) frequency dim.

    The dim is collected (bounded — see module docstring); the loop keeps
    a pair→count index and updates only the words touched by each merge,
    so the cost is O(num_merges · touched-words), not a full recount."""
    if isinstance(wc, DataFrame):
        rows = [(r[0], int(r[1])) for r in wc.collect()]
    else:
        rows = [(w, int(n)) for w, n in wc]
    words: list[list[str]] = [list(_word_symbols(w)) for w, _ in rows]
    counts = [n for _, n in rows]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + counts[i]
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic: max count, ties by lexicographically smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            syms, n = words[i], counts[i]
            j = 0
            while j < len(syms) - 1:
                if syms[j] == best[0] and syms[j + 1] == best[1]:
                    if j > 0:
                        _bump(pair_counts, pair_words, (syms[j - 1], syms[j]), -n, i)
                        _bump(pair_counts, pair_words, (syms[j - 1], new_sym), n, i)
                    if j + 2 < len(syms):
                        _bump(pair_counts, pair_words, (syms[j + 1], syms[j + 2]), -n, i)
                        _bump(pair_counts, pair_words, (new_sym, syms[j + 2]), n, i)
                    syms[j : j + 2] = [new_sym]
                else:
                    j += 1
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def _bump(pc, pw, pair, delta, word_idx):
    pc[pair] = pc.get(pair, 0) + delta
    if pc[pair] <= 0:
        pc.pop(pair, None)
        pw.pop(pair, None)
    else:
        pw.setdefault(pair, set()).add(word_idx)


def bpe_vocab(merges: list[tuple[str, str]],
              alphabet: list[str]) -> list[str]:
    """id→token-string table: sorted alphabet (with ``</w>`` variants)
    first, then one token per merge in merge order. Duplicates (two merge
    paths yielding the same string) keep their first id; encode only ever
    emits the first occurrence's id."""
    vocab = sorted(set(alphabet))
    seen = set(vocab)
    for a, b in merges:
        t = a + b
        if t not in seen:
            vocab.append(t)
            seen.add(t)
    return vocab


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def corpus_alphabet(wc: DataFrame) -> list[str]:
    """Distinct symbols of the word dim (chars + end-of-word variants) —
    a column-expression distinct over exploded symbol arrays."""
    # symbols = every char except the last, plus last+END
    body = wc.select(
        F.explode(
            F.slice(F.split("word", ""), 1, F.length("word") - 1)
        ).alias("s")
    )
    tail = wc.select(
        F.concat(F.substring("word", -1, 1), F.lit(END)).alias("s")
    )
    rows = body.union(tail).distinct().orderBy("s").collect()
    return [r.s for r in rows]


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens:array<int>, n_tok) — the BASELINE tokens payload from
    text. Distinct words are encoded ONCE (pandas UDF over the dim), then
    broadcast-mapped onto per-doc word positions and reassembled."""
    ranks = {p: i for i, p in enumerate(merges)}
    tok_id = {t: i for i, t in enumerate(vocab)}

    @F.pandas_udf("array<int>")
    def _encode(wordss: pd.Series) -> pd.Series:
        return wordss.map(
            lambda w: [tok_id[s] for s in _encode_word(w, ranks)]
        )

    words_pos = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tx.words(F.col(text_col))).alias("__pos", "word"),
    ).filter(F.col("word") != "")
    dim = (
        words_pos.select("word").distinct()
        .withColumn("__ids", _encode(F.col("word")))
    )
    joined = words_pos.join(F.broadcast(dim), "word")
    out = (
        joined.groupBy("__id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__ids"))
                    ),
                    lambda x: x["__ids"],
                )
            ).alias("tokens")
        )
        .select(
            F.col("__id").alias(id_col), "tokens",
            F.size("tokens").alias("n_tok"),
        )
    )
    return out


def bpe_decode(tokens: Column, vocab: list[str]) -> Column:
    """tokens → text (exact inverse of encode for in-vocab text): map ids
    through the vocab literal, drop the ``</w>`` markers into spaces."""
    vlit = F.array(*[F.lit(t) for t in vocab])
    joined = F.array_join(
        F.transform(tokens, lambda i: F.element_at(vlit, i + 1)), ""
    )
    return F.rtrim(F.replace(joined, F.lit(END), F.lit(" ")))
