"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2).

Beyond-reference training-data op: the C4 pipeline's heuristic rules,
applied the way the paper describes them — per LINE first, then per
document over the surviving lines:

* keep a line only if it ends in a terminal punctuation mark, has at
  least ``min_words`` words (paper: 5), and does not contain the word
  "javascript" (case-insensitive);
* drop the whole document if the surviving text contains ``{`` or the
  phrase "lorem ipsum", or has fewer than ``min_sentences`` terminal
  punctuation marks (paper: 3 sentences).

The paper's fourth rule class — a bad-words blocklist — is a policy
input, not an algorithm; pass extra ``drop_phrases`` for it. The
three-sentence-span dedup the paper applies afterwards is
``dedup.paragraph_dedup`` in this repo.

All pure column math (split → filter → array_join; whole-stage codegen);
per-doc work is linear in the document, nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL = r"""[.!?"']\s*$"""


def c4_keep_line(ln: Column, min_words: int = 5) -> Column:
    """The per-line predicate (terminal punctuation, word floor, no
    'javascript')."""
    return (
        ln.rlike(TERMINAL)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words)
        & ~F.lower(ln).contains("javascript")
    )


def c4_clean_lines(text: Column, min_words: int = 5) -> Column:
    """text → surviving lines re-joined with newlines."""
    kept = F.filter(
        F.split(text, "\n"), lambda ln: c4_keep_line(ln, min_words)
    )
    return F.array_join(kept, "\n")


def c4_filters(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
    drop_phrases: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the full rule set; returns every input row annotated with
    ``cleaned`` (surviving lines), ``n_kept_lines``, ``n_sentences``,
    ``has_brace``, ``has_lorem`` and the final ``keep`` verdict — callers
    filter on ``keep`` (annotated-not-filtered so curation runs can audit
    drop reasons, the same contract as text.repetition_features)."""
    cleaned = c4_clean_lines(F.col(text_col), min_words)
    lowered = F.lower(cleaned)
    n_sent = F.size(F.split(cleaned, r"[.!?]")) - 1
    has_brace = cleaned.contains("{")
    has_lorem = lowered.contains("lorem ipsum")
    extra_hit = F.lit(False)
    for p in drop_phrases:
        extra_hit = extra_hit | lowered.contains(p.lower())
    out = docs.select(
        "*",
        cleaned.alias("cleaned"),
        F.when(cleaned == "", F.lit(0))
        .otherwise(F.size(F.split(cleaned, "\n"))).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        extra_hit.alias("has_drop_phrase"),
    )
    keep = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_brace") & ~F.col("has_lorem")
        & ~F.col("has_drop_phrase")
    )
    return out.select("*", keep.alias("keep"))
