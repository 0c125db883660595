"""Verification ledger: make window rotation mechanical.

Round 2 taught that a rewritten operator can silently miss hard driver
verification if its gate query isn't in the curated 50-slot window. This
tool records, per registered query, the strongest verification evidence it
has ("driver-rNN" from a CORRECTNESS_r*.json green row, else the weaker
"judge-r03" full-sweep mark, else "local" for queries added after the
last judged round and verified only by tools/check_correctness.py) plus a
content hash of the query's implementation at that moment: the gate
function source, its oracle SQL, and the bytes of every
``vector_spark.*`` module the gate source references.

Hash scope is the gate source plus modules the gate source references BY
NAME (one level — `vector_spark.plans` hashes plans/__init__.py, not
every module under it), so a deep-dependency edit can escape a query's
hash. That is acceptable debt because deep edits always hit SOME gate
that references the module directly (topology.py edits flagged
cfg_encoded_sink/stream_staged_chain), the full local sweep runs every
round anyway, and a transitive import walk would make every hash change
on every edit, destroying the signal.

``tests/test_verification_ledger.py`` then enforces: any registered query
whose current hash differs from its ledger hash (implementation changed
since its last green) MUST occupy a slot in ``__spark_entry__._WINDOW``,
and any query absent from the ledger (brand-new) must either be windowed
or freshly recorded here after a local oracle check. That makes the
round-2 incident structurally impossible.

Driver-evidence hashes are NOT computed at update() time: a code edit
landing between a green CORRECTNESS_r*.json run and the update would
otherwise be recorded as verified at the post-edit hash, laundering an
unverified change past the very check this ledger enforces. Instead the
end-of-round chain runs ``snapshot`` (writing CORRECTNESS_HASHES.json,
committed with the round's final state — the exact code the driver
runs), and update() stamps driver evidence with the SNAPSHOT hash. If
the code changed since the snapshot, check() then correctly flags the
query as changed-since-verified.

Usage:
  python tools/verification_ledger.py update            # refresh evidence + hashes
  python tools/verification_ledger.py check             # what the pytest runs
  python tools/verification_ledger.py record NAME ...   # mark local-verified
  python tools/verification_ledger.py snapshot          # end-of-round hash freeze
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

REPO = Path("/root/repo")
LEDGER = REPO / "VERIFICATION_LEDGER.json"
SNAPSHOT = REPO / "CORRECTNESS_HASHES.json"
# The full 262-query judge sweep in the round-3 verdict (VERDICT.md:
# "262/262 bit-exact") covers every query registered at commit 93d2524.
JUDGE_SWEEP_ROUND = "judge-r03"
JUDGE_SWEEP_COMMIT = "93d2524"

_MOD_RE = re.compile(r"\bvector_spark(?:\.\w+)*")


def _module_files(src: str) -> list[Path]:
    files: set[Path] = set()
    for dotted in _MOD_RE.findall(src):
        rel = Path(dotted.replace(".", "/"))
        for cand in (REPO / rel / "__init__.py", (REPO / rel).with_suffix(".py")):
            if cand.exists():
                files.add(cand)
    return sorted(files)


def impl_hash(name: str) -> str:
    import __spark_entry__ as entry

    fn = entry._QUERIES[name]
    src = inspect.getsource(fn)
    h = hashlib.sha256(src.encode())
    h.update(entry._ORACLES.get(name, "").encode())
    for f in _module_files(src):
        h.update(str(f.relative_to(REPO)).encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:16]


def _driver_green() -> dict[str, str]:
    """name -> latest driver round with a green (rows+hash) row."""
    out: dict[str, str] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = path.stem.split("_r")[1]
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match", True)
            ):
                out[name] = f"driver-r{rnd}"
    return out


def load() -> dict:
    if LEDGER.exists():
        return json.loads(LEDGER.read_text())
    return {"queries": {}}


def save(ledger: dict) -> None:
    LEDGER.write_text(json.dumps(ledger, indent=1, sort_keys=True) + "\n")


def snapshot() -> None:
    """Freeze every registered query's impl hash — run in the end-of-
    round chain so the committed file records the hashes of exactly the
    code the driver's correctness run will execute. update() then stamps
    driver evidence with these frozen hashes, never with hashes computed
    after later edits."""
    import __spark_entry__ as entry

    hashes = {name: impl_hash(name) for name in entry._QUERIES}
    SNAPSHOT.write_text(
        json.dumps({"hashes": hashes}, indent=1, sort_keys=True) + "\n"
    )
    print(f"snapshot: froze {len(hashes)} query hashes")


def _snapshot_hashes() -> dict[str, str] | None:
    if SNAPSHOT.exists():
        return json.loads(SNAPSHOT.read_text())["hashes"]
    return None


def update() -> None:
    import __spark_entry__ as entry

    ledger = load()
    green = _driver_green()
    frozen = _snapshot_hashes()
    for name in entry._QUERIES:
        row = ledger["queries"].get(name, {})
        prior = row.get("verified")
        if name in green:
            verified = green[name]
        elif prior and not prior.startswith("driver"):
            verified = prior  # keep judge/local mark
        elif prior:
            verified = prior
        else:
            verified = None
        # Only refresh the hash when evidence is fresh this run: a driver
        # round newer than what was recorded, or an explicit `record`.
        # Driver evidence is stamped at the SNAPSHOT hash (the code the
        # driver actually ran); stamping at the current hash would
        # launder any edit made since the green run past check().
        if verified and verified != prior:
            if verified.startswith("driver") and frozen is not None:
                if name in frozen:
                    row = {"verified": verified, "hash": frozen[name]}
                else:
                    print(
                        f"refusing to stamp {name}: driver-green but "
                        f"absent from CORRECTNESS_HASHES.json snapshot"
                    )
                    row = row or {"verified": None, "hash": None}
            else:
                row = {"verified": verified, "hash": impl_hash(name)}
        elif not row:
            row = {"verified": None, "hash": None}
        ledger["queries"][name] = row
    # drop unregistered queries
    for name in list(ledger["queries"]):
        if name not in entry._QUERIES:
            del ledger["queries"][name]
    save(ledger)
    n = sum(1 for r in ledger["queries"].values() if r["verified"])
    print(f"ledger: {len(ledger['queries'])} queries, {n} with evidence")


def seed_judge_sweep() -> None:
    """One-time: mark every query that existed at the judged commit and
    has no driver row as judge-r03-verified at its CURRENT hash (the
    judge verified this exact code: `git diff` vs 93d2524 shows no
    implementation change for these queries)."""
    import __spark_entry__ as entry

    ledger = load()
    green = _driver_green()
    for name in entry._QUERIES:
        if name in green:
            ledger["queries"][name] = {
                "verified": green[name],
                "hash": impl_hash(name),
            }
        else:
            ledger["queries"][name] = {
                "verified": JUDGE_SWEEP_ROUND,
                "hash": impl_hash(name),
            }
    save(ledger)
    print(f"seeded {len(ledger['queries'])} queries")


def record(names: list[str]) -> None:
    """Mark queries as locally oracle-verified at their current hash
    (for code added/changed after the last judged round; the next driver
    round upgrades the mark)."""
    ledger = load()
    for name in names:
        ledger["queries"][name] = {
            "verified": "local",
            "hash": impl_hash(name),
        }
    save(ledger)
    print(f"recorded {len(names)} local-verified queries")


def check() -> list[str]:
    """Return violation strings; empty means rotation debt is clean."""
    import __spark_entry__ as entry

    ledger = load()["queries"]
    window = set(entry._WINDOW)
    problems = []
    for name in entry._QUERIES:
        if name in window:
            continue  # getting hard-verified this round
        row = ledger.get(name)
        if row is None or row.get("hash") is None:
            problems.append(
                f"{name}: new query with no ledger entry - add to _WINDOW "
                f"or run `verification_ledger.py record {name}` after a "
                f"local oracle check"
            )
        elif row["hash"] != impl_hash(name):
            problems.append(
                f"{name}: implementation changed since {row['verified']} "
                f"- rotate into _WINDOW or re-record after a local check"
            )
    return problems


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    if cmd == "update":
        update()
    elif cmd == "seed-judge-sweep":
        seed_judge_sweep()
    elif cmd == "record":
        record(sys.argv[2:])
    elif cmd == "snapshot":
        snapshot()
    elif cmd == "check":
        problems = check()
        for p in problems:
            print(p)
        print(f"{len(problems)} violations")
        return 1 if problems else 0
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
