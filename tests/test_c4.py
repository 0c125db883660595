"""C4 line-level cleaning (dataprep/c4.py) vs the paper's rule set."""

from __future__ import annotations

from vector_spark.dataprep.c4 import c4_filters

DOCS = [
    # keeps: 3 good lines → 3 sentences → keep
    (0, "the quick brown fox jumps over the dog.\n"
        "short line.\n"
        "no terminal punctuation in this line at all\n"
        "please enable JavaScript to view the page now.\n"
        "another perfectly good sentence with many words!\n"
        "does a third full sentence appear right here?"),
    # brace in a surviving line → doc dropped
    (1, "this { brace sentence has plenty of words inside.\n"
        "second good sentence with a healthy word count.\n"
        "third good sentence rounds out the document nicely."),
    # lorem ipsum → dropped
    (2, "lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
        "second good sentence with a healthy word count.\n"
        "third good sentence rounds out the document nicely."),
    # only 2 surviving sentences → dropped
    (3, "one good sentence with a fine number of words.\n"
        "two good sentences with a fine number of words."),
    # nothing survives the line filter
    (4, "all\nlines\nare\ntiny"),
]


def test_c4_rules(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {r.doc_id: r for r in c4_filters(df).collect()}

    r0 = got[0]
    assert r0.keep
    assert r0.n_kept_lines == 3
    assert r0.cleaned.splitlines() == [
        "the quick brown fox jumps over the dog.",
        "another perfectly good sentence with many words!",
        "does a third full sentence appear right here?",
    ]
    assert r0.n_sentences == 3

    assert not got[1].keep and got[1].has_brace
    assert not got[2].keep and got[2].has_lorem
    assert not got[3].keep and got[3].n_sentences == 2
    assert not got[4].keep and got[4].n_kept_lines == 0


def test_c4_drop_phrases(spark):
    df = spark.createDataFrame(
        [(0, "subscribe to our newsletter for the latest updates today.\n"
             "second good sentence with a healthy word count here.\n"
             "third good sentence rounds out the document nicely.")],
        "doc_id bigint, text string",
    )
    assert c4_filters(df).first().keep
    out = c4_filters(df, drop_phrases=("Subscribe to our newsletter",))
    assert not out.first().keep and out.first().has_drop_phrase
