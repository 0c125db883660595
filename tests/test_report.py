"""Dataset-card / tokenizer-fertility reports (dataprep/report.py)."""

from __future__ import annotations

from vector_spark.dataprep.report import dataset_card, token_fertility


def test_dataset_card_counts_and_dups(spark):
    rows = [
        (1, "same text", "en", "a"),
        (2, "same text", "en", "a"),   # exact dup within source a
        (3, "unique 1", "de", "a"),
        (4, "same text", "en", "b"),   # same digest, DIFFERENT source: not a dup
        (5, "unique 2", "en", "b"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    card = {r.source: r for r in dataset_card(df).collect()}
    a, b = card["a"], card["b"]
    assert (a.n_docs, a.n_dups) == (3, 1)
    assert (b.n_docs, b.n_dups) == (2, 0)
    assert a.corpus_share == 0.6 and b.corpus_share == 0.4
    assert a.dup_frac == round(1 / 3, 6)
    assert a.top_lang == "en" and a.top_lang_share == round(2 / 3, 6)


def test_token_fertility(spark):
    rows = [
        ("a", 10, "12345"),      # 10 tok / 5 chars
        ("a", 30, "1234567890"),
        ("b", 20, "1234"),
    ]
    df = spark.createDataFrame(rows, "source string, n_tok int, text string")
    out = {r.group_key: r for r in
           token_fertility(df, text_col="text").collect()}
    a = out["a"]
    assert (a.n_rows, a.n_tokens, a.n_chars) == (2, 40, 15)
    assert a.tokens_per_row == 20.0
    assert a.tokens_per_char == round(40 / 15, 6)
    assert a.token_share == round(40 / 60, 6)
    assert out["b"].token_share == round(20 / 60, 6)


def test_source_dup_matrix(spark):
    from vector_spark.dataprep.report import source_dup_matrix

    rows = [
        (1, "shared-1", "a"), (2, "shared-1", "b"), (3, "shared-1", "c"),
        (4, "shared-2", "a"), (5, "shared-2", "b"),
        (6, "only-a", "a"), (7, "only-b", "b"),
        (8, "shared-2", "a"),  # second copy in same source: still 1 digest
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r.n_shared
           for r in source_dup_matrix(df).collect()}
    # shared-1 in {a,b,c} -> 3 pairs; shared-2 in {a,b} -> 1 pair
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_snapshot_diff(spark):
    from vector_spark.dataprep.report import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "going away")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed now"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_chunk_text_windows(spark):
    from vector_spark.dataprep.text import chunk_text

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "abcdef")],
        "doc_id long, text string",
    )
    out = sorted(
        chunk_text(df, chunk_chars=6, overlap=2).collect(),
        key=lambda r: (r.doc_id, r.chunk_index),
    )
    got = [(r.chunk_id, r.char_start, r.chunk_text) for r in out]
    # step 4: doc 1 (10 chars) -> starts 0, 4 (last window reaches the
    # end, full coverage, no degenerate tail); doc 3 (6 chars = exactly
    # one window) and doc 2 (shorter) -> one chunk each
    assert got == [
        ("1#0", 0, "abcdef"),
        ("1#1", 4, "efghij"),
        ("2#0", 0, "xy"),
        ("3#0", 0, "abcdef"),
    ]


def test_make_datasheet_renders(spark):
    import sys

    sys.path.insert(0, "tools")
    from make_datasheet import build_datasheet

    md = build_datasheet(spark, "/root/testdata/sf0.001")
    assert "# Corpus datasheet" in md
    assert "Per-source dataset card" in md
    assert "| source |" in md or "| source " in md
    assert "Embedding health" in md
