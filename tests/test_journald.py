"""journald decode (sources/journald.py) vs src/sources/journald.rs
semantics — the filter_matches truth table, unit fixup, priority remap,
and timestamp fallback."""

from __future__ import annotations

import json

from vector_spark.sources import journald


def _parse(spark, records, **kw):
    df = spark.createDataFrame(
        [(json.dumps(r),) for r in records], "value string"
    )
    return journald.parse_journald(df, "value", **kw).collect()


def test_fixup_unit():
    assert journald.fixup_unit("nginx") == "nginx.service"
    assert journald.fixup_unit("app.scope") == "app.scope"
    assert journald.fixup_unit("a.b") == "a.b"


def test_filter_truth_table(spark):
    """Mirrors journald.rs filter_matches_works_correctly: a record with
    no unit field passes exclude-only configs but fails include configs;
    matching include keeps, matching exclude drops."""
    zero = {"MESSAGE": "zero"}
    one = {"MESSAGE": "one", "_SYSTEMD_UNIT": "one.service"}
    bar = {"MESSAGE": "bar", "_SYSTEMD_UNIT": "bar.service"}
    recs = [zero, one, bar]

    def msgs(**kw):
        return sorted(r.message for r in _parse(spark, recs, **kw))

    assert msgs() == ["bar", "one", "zero"]
    assert msgs(include_units=["one", "two"]) == ["one"]
    assert msgs(exclude_units=["foo", "bar"]) == ["one", "zero"]
    assert msgs(include_units=["one", "two"],
                exclude_units=["foo", "bar"]) == ["one"]
    # exclude wins over include when both match
    assert msgs(include_units=["one", "bar"],
                exclude_units=["bar"]) == ["one"]


def test_field_mapping_and_priority(spark):
    rows = _parse(
        spark,
        [
            {
                "__CURSOR": "c1",
                "__REALTIME_TIMESTAMP": "1704174378194000",
                "_SOURCE_REALTIME_TIMESTAMP": "1704174378194500",
                "_HOSTNAME": "web1",
                "PRIORITY": "3",
                "MESSAGE": "boom",
                "UNIT_EXTRA": "x",
            },
            {"MESSAGE": "later", "__REALTIME_TIMESTAMP": "1704174378194000",
             "PRIORITY": "notanum"},
        ],
    )
    r = next(x for x in rows if x.message == "boom")
    assert r.host == "web1" and r.cursor == "c1"
    # source timestamp preferred over received
    assert r.timestamp.microsecond == 194500
    assert r.fields["PRIORITY"] == "ERR"
    assert r.fields["UNIT_EXTRA"] == "x"
    assert "_HOSTNAME" not in r.fields
    s = next(x for x in rows if x.message == "later")
    assert s.timestamp.microsecond == 194000
    assert s.host is None
    # non-numeric PRIORITY passes through unchanged
    assert s.fields["PRIORITY"] == "notanum"


def test_include_matches_on_arbitrary_field(spark):
    recs = [
        {"MESSAGE": "a", "SYSLOG_IDENTIFIER": "kernel"},
        {"MESSAGE": "b", "SYSLOG_IDENTIFIER": "sshd"},
        {"MESSAGE": "c"},
    ]
    out = _parse(
        spark, recs, include_matches={"SYSLOG_IDENTIFIER": ["kernel"]}
    )
    assert [r.message for r in out] == ["a"]
