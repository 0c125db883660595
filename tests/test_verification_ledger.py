"""Rotation-debt enforcement: any registered query whose implementation
(gate source + oracle SQL + referenced vector_spark modules) changed
since its last recorded verification must occupy a slot in the curated
driver window, and any brand-new query must be windowed or explicitly
local-recorded after an oracle check. Makes the round-2 "rewritten
operator silently unverified" incident structurally impossible.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

import verification_ledger as vl  # noqa: E402


def test_ledger_covers_every_registered_query():
    import __spark_entry__ as entry

    ledger = vl.load()["queries"]
    window = set(entry._WINDOW)
    unledgered = [
        n for n in entry._QUERIES if n not in ledger and n not in window
    ]
    assert unledgered == [], (
        f"queries with neither a ledger entry nor a window slot: "
        f"{unledgered}"
    )


def test_no_query_changed_since_its_last_verification():
    problems = vl.check()
    assert problems == [], "\n".join(problems)
