"""Log template mining — collapse free-text log lines into their constant
"templates" by masking variable tokens, then count/rank the patterns.

Every log-analytics surface has this operator (Splunk ``| patterns``,
Datadog Log Patterns, the Drain algorithm of He et al. 2017); the
reference engine itself stops at parsing (``parse_grok``/``parse_regex``,
lib/codecs) and leaves "what are the distinct message shapes in this
stream?" to the user. Over a 10^12-row corpus it is THE triage query:
a terabyte of lines usually collapses to a few thousand templates.

Spark-first shape:

- **Masking is pure column math** (`split` → `transform` + `rlike` →
  `array_join`): whole-stage codegen, no Python, reproducible by any
  engine with regex support (DuckDB oracle `ev_log_templates`).
- The Drain paper's variable heuristic — a token containing a digit is a
  parameter — is the mask rule (``TOKEN_HAS_DIGIT``); pass a custom
  ``is_var`` lambda for domain rules (hex ids, emails, quoted strings).
- **The aggregate is skew-proof by construction**: groupBy(template) with
  count/min is map-side partially aggregated, so the hottest template
  (often >90% of a stream) ships ONE partial row per task, not its raw
  rows. Template cardinality is tiny (that is the operator's premise),
  so the reduce side is a broadcast-sized dimension.
- :func:`template_outliers` inverts the view — keep the RAW rows whose
  template share is below ``max_share`` (the rare-shape anomalies). The
  counted template dimension is broadcast back against the stream, so
  the full corpus is scanned once more but never shuffled.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Drain's variable heuristic: any token containing a digit is a parameter.
TOKEN_HAS_DIGIT = "[0-9]"
MASK = "<*>"


def mask_message(
    message: Column,
    is_var: Callable[[Column], Column] | None = None,
    mask: str = MASK,
) -> Column:
    """Whitespace-tokenize ``message`` and replace every variable token
    (default: contains a digit) with ``mask``; returns the template
    string. Token COUNT is preserved, so lines of different shapes can
    never share a template."""
    pred = is_var if is_var is not None else (lambda t: t.rlike(TOKEN_HAS_DIGIT))
    toks = F.split(message, r"\s+")
    masked = F.transform(
        toks, lambda t: F.when(pred(t), F.lit(mask)).otherwise(t)
    )
    return F.array_join(masked, " ")


def log_templates(
    df: DataFrame,
    message_col: str = "message",
    id_col: str | None = None,
    is_var: Callable[[Column], Column] | None = None,
    mask: str = MASK,
) -> DataFrame:
    """Mine (template, n_events[, first_id]) from ``df[message_col]``,
    most-frequent first (ties broken by template for determinism).
    ``first_id`` (min of ``id_col``) is the canonical example row."""
    tpl = mask_message(F.col(message_col), is_var, mask).alias("template")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if id_col is not None:
        aggs.append(F.min(id_col).alias("first_id"))
    return (
        df.groupBy(tpl)
        .agg(*aggs)
        .orderBy(F.desc("n_events"), "template")
    )


def template_outliers(
    df: DataFrame,
    message_col: str = "message",
    max_share: float = 0.01,
    total: int | None = None,
    is_var: Callable[[Column], Column] | None = None,
    mask: str = MASK,
) -> DataFrame:
    """Rows whose message template accounts for < ``max_share`` of the
    stream — the rare-shape anomalies a triage query surfaces first.
    Adds ``template`` and ``template_share`` to the surviving rows.

    Two passes over the input, zero row shuffles: pass 1 builds the
    (tiny) template-count dimension, pass 2 broadcast-joins it back.
    Pass ``total`` when the caller already knows the row count (saves
    the count action)."""
    n = total if total is not None else df.count()
    tpl = mask_message(F.col(message_col), is_var, mask)
    dim = (
        df.select(tpl.alias("template"))
        .groupBy("template")
        .agg((F.count(F.lit(1)) / F.lit(n)).alias("template_share"))
        .filter(F.col("template_share") < max_share)
    )
    return df.withColumn("template", tpl).join(
        F.broadcast(dim), "template", "inner"
    )


def template_drift(
    df: DataFrame,
    message_col: str = "message",
    split_cond: Column | None = None,
    is_var: Callable[[Column], Column] | None = None,
    mask: str = MASK,
) -> DataFrame:
    """Template-distribution drift between two halves of the stream (the
    "a new error shape appeared / an old one vanished" detector): per
    template, counts and shares in the A side (``split_cond`` true) and
    the B side, plus ``drift = share_b − share_a``. Templates absent
    from one side count 0 there — exactly the newly-appeared /
    disappeared cases a triage view sorts to the top.

    One pass over the stream into a map-side-combined (template, side)
    aggregate; everything after runs on the tiny template dim. Share
    math is ROUND(…, 6) on identical expression shapes so the report is
    engine-portable. Rows where ``split_cond`` is NULL (e.g. a null ts
    in ``ts < cutoff``) count on the B side rather than vanishing, and
    an all-one-side split yields 0.0 shares on the empty side instead
    of NULL (divide-by-zero guard)."""
    if split_cond is None:
        raise ValueError("split_cond is required (e.g. ts < cutoff)")
    tpl = mask_message(F.col(message_col), is_var, mask).alias("template")
    sides = df.select(
        tpl, F.coalesce(split_cond.cast("int"), F.lit(0)).alias("__a")
    )
    counts = sides.groupBy("template").agg(
        F.sum("__a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("__a")).cast("long").alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            "template",
            "n_a",
            "n_b",
            F.round(
                F.col("n_a") / F.greatest(F.col("__ta"), F.lit(1)), 6
            ).alias("share_a"),
            F.round(
                F.col("n_b") / F.greatest(F.col("__tb"), F.lit(1)), 6
            ).alias("share_b"),
            F.round(
                F.round(F.col("n_b") / F.greatest(F.col("__tb"), F.lit(1)), 6)
                - F.round(
                    F.col("n_a") / F.greatest(F.col("__ta"), F.lit(1)), 6
                ),
                6,
            ).alias("drift"),
        )
    )
