"""Multiline aggregation: collapse continuation lines into one event.

Parity: the reference's line_agg engine (src/line_agg.rs:24-59) with modes
``continue_through`` (keep appending while the condition matches — e.g.
indented stacktrace lines), ``continue_past`` (line matching means the NEXT
line is also part — trailing backslash), ``halt_before`` (a matching line
starts a NEW event), ``halt_with`` (a matching line is the LAST line of the
event).

Batch shape: a file's lines with a position column → boundary flag per mode
→ running sum = event id → group + concat. One window pass per file (lines
of one file must be processed in order: partition by file, order by line
number — files are the parallelism unit, as in the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MODES = ("continue_through", "continue_past", "halt_before", "halt_with")


def aggregate_lines(
    df: DataFrame,
    pattern: str,
    mode: str = "continue_through",
    line_col: str = "value",
    file_col: str = "_source_file",
    pos_col: str = "_line_no",
    out_col: str = "message",
    join_with: str = "\n",
) -> DataFrame:
    """Collapse lines into multiline events.

    Output: one row per event with ``out_col`` (joined lines), the file,
    the first line's position, and ``n_lines``.
    """
    if mode not in MODES:
        raise ValueError(f"unknown multiline mode {mode!r}")
    w = Window.partitionBy(file_col).orderBy(pos_col)
    line = F.col(line_col)
    matches = line.rlike(pattern)

    if mode == "continue_through":
        # a line that does NOT match starts a new event
        starts = ~matches
    elif mode == "continue_past":
        # new event unless the PREVIOUS line matched (it continued past)
        prev = F.lag(matches.cast("int"), 1, 0).over(w)
        starts = prev == 0
    elif mode == "halt_before":
        # a matching line starts a new event
        starts = matches
    else:  # halt_with: the line AFTER a matching line starts a new event
        prev = F.lag(matches.cast("int"), 1, 1).over(w)
        starts = prev == 1

    if mode == "continue_through":
        # first line of the file always starts an event even if it matches
        rn = F.row_number().over(w)
        starts = starts | (rn == 1)

    df2 = df.withColumn(
        "__evt",
        F.sum(starts.cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        df2.groupBy(file_col, "__evt")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(pos_col).alias("p"), line.alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                join_with,
            ).alias(out_col),
            F.min(pos_col).alias(pos_col),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .drop("__evt")
    )


def read_multiline(
    spark,
    path: str,
    pattern: str,
    mode: str = "continue_through",
) -> DataFrame:
    """File source + multiline aggregation (≙ reference file source
    ``multiline`` config, src/sources/file.rs:188-191)."""
    from vector_spark.sources.readers import with_lineage

    lines = (
        spark.read.text(path)
        .select("value")
    )
    # line numbers need per-file order: zipWithIndex is per-partition; use
    # a monotonic id within input_file_name ordering (files read in order
    # within a partition — each text file split keeps line order)
    lines = with_lineage(lines, path).withColumn(
        "_line_no", F.monotonically_increasing_id()
    )
    return aggregate_lines(lines, pattern, mode)
