"""Generate a corpus DATASHEET.md from the distributed report operators.

The dataset-card tables every corpus release ships (per-source volume and
duplication, cross-source copying, tokenizer health) come out of the same
distributed pass as the pipeline — this tool just runs those operators
and renders their (dim-sized) outputs as markdown. Rendering is
driver-side because the TABLES are dim-sized (sources × sources at
worst); the aggregations underneath are the scale-shaped ones documented
in vector_spark/dataprep/report.py.

Usage:
    python tools/make_datasheet.py /root/testdata/sf0.01 out/DATASHEET.md
"""

from __future__ import annotations

import os
import sys


def _md_table(rows: list[dict]) -> str:
    if not rows:
        return "_(empty)_\n"
    cols = list(rows[0].keys())
    out = ["| " + " | ".join(cols) + " |",
           "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        out.append(
            "| " + " | ".join(
                "" if r[c] is None else str(r[c]) for c in cols
            ) + " |"
        )
    return "\n".join(out) + "\n"


def build_datasheet(spark, sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from vector_spark import tables
    from vector_spark.dataprep.report import (
        dataset_card,
        source_dup_matrix,
        token_fertility,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    card = [r.asDict() for r in dataset_card(docs).orderBy("source").collect()]
    dups = [
        r.asDict()
        for r in source_dup_matrix(docs)
        .orderBy(F.desc("n_shared"), "source_a", "source_b")
        .limit(20)
        .collect()
    ]
    sections = [
        "# Corpus datasheet\n",
        f"Input: `{sf_dir}`\n",
        "## Per-source dataset card\n",
        _md_table(card),
        "## Cross-source duplication (top pairs)\n",
        _md_table(dups),
    ]
    # tokenizer health: fertility per source over the deterministic
    # sequence table (tokens/char drift flags a mismatched tokenizer)
    fert = [
        r.asDict()
        for r in token_fertility(
            tables.with_message(tables.sequences(spark, 10_000)),
            group_col="source",
            text_col="message",
        )
        .orderBy("group_key")
        .collect()
    ]
    sections += ["## Tokenizer health (fertility per source)\n",
                 _md_table(fert)]
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        from vector_spark.dataprep.similarity import embedding_health

        emb = spark.read.parquet(emb_path)
        health = [
            r.asDict()
            for r in embedding_health(emb).orderBy("group_key").collect()
        ]
        sections += ["## Embedding health\n", _md_table(health)]
    return "\n".join(sections)


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(
            "usage: python tools/make_datasheet.py <sf_dir> <out.md>",
            file=sys.stderr,
        )
        return 2
    from vector_spark.session import get_spark

    spark = get_spark("datasheet")
    md = build_datasheet(spark, argv[1])
    os.makedirs(os.path.dirname(argv[2]) or ".", exist_ok=True)
    with open(argv[2], "w") as fh:
        fh.write(md)
    print(f"wrote {argv[2]} ({len(md)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
