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


def test_update_stamps_driver_evidence_at_snapshot_hash(monkeypatch, tmp_path):
    """Driver-green evidence must be recorded at the hash FROZEN when the
    round closed (the code the driver actually ran), not the hash at
    update() time — otherwise an edit landing between the green run and
    the update is laundered past the changed-since-verified check."""
    import json

    import __spark_entry__ as entry

    name = next(iter(entry._QUERIES))
    monkeypatch.setattr(vl, "LEDGER", tmp_path / "ledger.json")
    monkeypatch.setattr(vl, "SNAPSHOT", tmp_path / "snap.json")
    monkeypatch.setattr(vl, "impl_hash", lambda n: "post-edit-hash")
    monkeypatch.setattr(vl, "_driver_green", lambda: {name: "driver-r99"})
    (tmp_path / "snap.json").write_text(
        json.dumps({"hashes": {name: "frozen-hash"}})
    )
    vl.save({"queries": {}})
    vl.update()
    row = vl.load()["queries"][name]
    assert row == {"verified": "driver-r99", "hash": "frozen-hash"}


def test_update_refuses_driver_evidence_missing_from_snapshot(
    monkeypatch, tmp_path
):
    import json

    import __spark_entry__ as entry

    name = next(iter(entry._QUERIES))
    monkeypatch.setattr(vl, "LEDGER", tmp_path / "ledger.json")
    monkeypatch.setattr(vl, "SNAPSHOT", tmp_path / "snap.json")
    monkeypatch.setattr(vl, "impl_hash", lambda n: "post-edit-hash")
    monkeypatch.setattr(vl, "_driver_green", lambda: {name: "driver-r99"})
    (tmp_path / "snap.json").write_text(json.dumps({"hashes": {}}))
    vl.save({"queries": {}})
    vl.update()
    row = vl.load()["queries"][name]
    assert row["verified"] is None  # not stamped — no frozen hash to trust
