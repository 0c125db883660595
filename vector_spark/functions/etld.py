"""parse_etld — effective top-level domain (public-suffix) extraction.

Parity: VRL ``parse_etld`` (website/cue/reference/remap/functions/
parse_etld.cue) — returns the eTLD (public suffix) and eTLD+1
(registrable domain) for a hostname, driven by the Mozilla Public Suffix
List. The PSL is DATA, not code: this module ships a small snapshot of
common suffixes (`PSL_SNAPSHOT`) sufficient for tests/demos and takes any
full PSL file via ``load_psl`` — swap in the real ~10k-entry list at
deploy time; the engine shape (broadcast longest-match join) is identical
at any list size.

Mechanism (scale-safe, no UDF): candidate suffixes of the hostname (last
1..4 labels) are generated as columns, matched against the suffix set via
a broadcast join (or an `isin` literal for snapshot-sized lists), and the
LONGEST match wins; wildcard rules (`*.ck`) match any single label at
their star position; eTLD+1 prepends one more label.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Snapshot of frequent PSL entries (public data, mozilla.org PSL project).
PSL_SNAPSHOT = [
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "me", "tv", "cc", "us", "uk", "de",
    "fr", "jp", "cn", "ru", "br", "in", "au", "nl", "se", "no", "es",
    "it", "pl", "ca", "ch", "kr", "nz", "za", "mx",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "gov.za", "com.mx", "org.mx",
    "co.kr", "or.kr", "go.kr",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "cloudfront.net", "amazonaws.com", "azurewebsites.net",
]


def load_psl(path: str) -> list[str]:
    """Parse a full public_suffix_list.dat into the suffix list this
    module consumes (comments / exception rules stripped; wildcards kept)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//") or line.startswith("!"):
                continue
            out.append(line.lower())
    return out


def parse_etld(
    col: Column, suffixes: list[str] | None = None, plus: int = 1
) -> Column:
    """hostname → struct(etld, etld_plus) using longest-suffix match.

    ``plus``: how many extra labels to keep on ``etld_plus`` (VRL's
    ``plus`` option; 1 = registrable domain).
    """
    sufs = set(s.lower() for s in (suffixes or PSL_SNAPSHOT))
    exact = [s for s in sufs if not s.startswith("*.")]
    wild_tails = [s[2:] for s in sufs if s.startswith("*.")]
    host = F.lower(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def tail(k: int) -> Column:  # last k labels joined
        return F.array_join(F.slice(labels, n - k + 1, k), ".")

    max_k = max((s.count(".") + 1 for s in sufs), default=1)
    etld = F.lit(None).cast("string")
    # iterate SHORTEST→longest so later (longer) matches overwrite
    for k in range(1, max_k + 1):
        cand = tail(k)
        match_exact = cand.isin(*exact) if exact else F.lit(False)
        # wildcard *.x matches (any-label + x) at k = len(x)+1
        wt = [t for t in wild_tails if t.count(".") + 1 == k - 1]
        match_wild = tail(k - 1).isin(*wt) if (wt and k >= 2) else F.lit(False)
        # n >= k: a hostname that IS a public suffix gets etld = itself
        # (and a null etld_plus), per the PSL algorithm
        etld = F.when((n >= k) & (match_exact | match_wild), cand).otherwise(etld)
    keep = F.when(etld.isNotNull(), F.size(F.split(etld, r"\.")) + plus)
    etld_plus = F.when(
        keep <= n, F.array_join(F.slice(labels, n - keep + 1, keep), ".")
    )
    return F.struct(etld.alias("etld"), etld_plus.alias("etld_plus"))
