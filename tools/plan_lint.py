"""Physical-plan lint across every registered gate query.

Greps each query's pre-execution physical plan for shapes that break at
scale: cartesian products, broadcast nested-loop joins, and
single-partition exchanges. Tiny-dimension single-partition work is fine
(bucket-offset tables, vocabulary caps, 1-row totals frames) — the
whitelist documents every allowed hit so a NEW choke point fails loudly.

Usage: python tools/plan_lint.py [sf_dir] [name ...]
Exit code = number of non-whitelisted findings.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from vector_spark.session import get_spark

FLAGS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin"),
    "single_part_exchange": re.compile(r"Exchange SinglePartition"),
}

# query -> {flag: (max allowed, why)}. Every entry must name the bounded
# structure that makes the plan safe at corpus scale.
ALLOW: dict[str, dict[str, tuple[int, str]]] = {
    # 1-row totals frames cross-joined back (declarative scalars): the
    # BNL join's build side is exactly one row.
    "doc_lm_perplexity": {
        "bnl_join": (2, "1-row LM totals frame cross-joined"),
    },
    "doc_dsir_weights": {
        "bnl_join": (4, "1-row Np/Nq totals frames cross-joined"),
    },
    "doc_lm_bigram_ppl": {
        "bnl_join": (2, "1-row unigram/bigram totals frame cross-joined"),
    },
    "doc_bpe_stats": {
        "bnl_join": (2, "1-row word-dim count × 1-row roundtrip flag"),
    },
    "seq_token_accounting": {
        "bnl_join": (2, "1-row corpus-token-total frame cross-joined"),
    },
    "seq_source_kl": {
        "bnl_join": (2, "1-row corpus-total frame cross-joined"),
    },
    "seq_bigram_ppl": {
        "bnl_join": (2, "1-row N/V totals frame cross-joined"),
    },
    "ev_template_drift": {
        "bnl_join": (2, "1-row side-totals frame cross-joined"),
    },
    "ev_rate_silence": {
        "bnl_join": (4, "1-row window-bounds frame cross-joined onto the key dim"),
    },
    "seq_mixture_report": {
        "bnl_join": (2, "1-row mixture-totals frame cross-joined"),
    },
    "seq_fertility": {
        "bnl_join": (2, "1-row corpus-token-total frame cross-joined"),
    },
    "doc_dataset_card": {
        "bnl_join": (2, "1-row corpus-doc-total frame cross-joined"),
    },
    "tpch_q22_antijoin": {
        "bnl_join": (2, "1-row scalar avg(acctbal) subquery frame"),
    },
    "tpch_q11_having_scalar": {
        "bnl_join": (2, "1-row global-total scalar frame cross-joined"),
    },
    "doc_bm25": {
        "bnl_join": (2, "1-row corpus-stats (N, avgdl) frame cross-joined"),
    },
    # brute-force cosine baselines: build side = the CAPPED query/sample
    # set broadcast against one corpus scan — the BNL IS the design
    # (bounded by the cap, never corpus × corpus).
    "emb_cosine_topk": {"bnl_join": (2, "50-query broadcast set × corpus scan")},
    "doc_hybrid_rrf": {
        "bnl_join": (
            8,
            "3 BM25 legs × 1-row stats frame + 3-query broadcast set × "
            "corpus scan + 1-row avgdl frames — all bounded build sides",
        ),
    },
    "emb_near_dups": {
        "bnl_join": (2, "exact baseline capped to 500 vectors (gate subset)")
    },
    "emb_pq_topk": {
        "bnl_join": (2, "broadcast query set × corpus ADC scan")
    },
    # recall gates: approximate arm (equi-join, no BNL) compared against
    # the brute-force arm on a capped seeded subsample — every BNL below
    # comes from the exact arm / tiny plane-literal frames.
    "emb_lsh_recall": {
        "bnl_join": (18, "capped exact arm + per-plane literal frames")
    },
    "emb_ivf_recall": {
        "bnl_join": (15, "capped exact arm + sampled-centroid dims")
    },
    "emb_pq_recall": {
        "bnl_join": (21, "capped exact arm + codebook dims")
    },
    # non-equi range enrichment: the range table is a broadcast dim by
    # contract (BetweenDates / CIDR ranges) — BNL against a bounded dim
    # is the correct distributed plan for a theta join.
    "ev_enrich_range": {
        "bnl_join": (2, "broadcast date-range dim (non-equi lookup)")
    },
}


def lint(name: str, df) -> list[str]:
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = []
    for flag, rx in FLAGS.items():
        n = len(rx.findall(plan))
        if not n:
            continue
        cap, why = ALLOW.get(name, {}).get(flag, (0, ""))
        if n <= cap:
            out.append(f"  allowed {flag} x{n} ({why})")
        else:
            out.append(f"! FINDING {flag} x{n} (allowed {cap})")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan_lint", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    findings = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"ERR  {name}: {e}")
            findings += 1
            continue
        notes = lint(name, df)
        bad = [x for x in notes if x.startswith("!")]
        findings += len(bad)
        status = "BAD " if bad else "ok  "
        print(f"{status} {name}")
        for x in notes:
            print(x)
    print(f"plan_lint findings: {findings}")
    return findings


if __name__ == "__main__":
    sys.exit(main())
