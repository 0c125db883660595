"""Contract for the curated driver hard-verification window.

The round driver oracle-verifies the FIRST 50 entries of ``queries()``;
``__spark_entry__._WINDOW`` curates those slots (one representative per
subsystem, rotated toward code that changed since its last green row).
These tests pin the contract so a careless registration reorder can't
silently rotate a rewritten operator out of hard verification again.
"""

import __spark_entry__ as entry


def test_window_is_exactly_fifty_unique_names():
    assert len(entry._WINDOW) == 50
    assert len(set(entry._WINDOW)) == 50


def test_window_names_are_registered_with_oracles():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    missing_q = [n for n in entry._WINDOW if n not in qs]
    missing_o = [n for n in entry._WINDOW if n not in os_]
    assert missing_q == [], f"window names without queries: {missing_q}"
    # every hard-verification slot must carry a full value-hash oracle,
    # not the weaker rows-only check
    assert missing_o == [], f"window names without oracles: {missing_o}"


def test_window_occupies_the_first_fifty_slots():
    assert list(entry.queries())[:50] == entry._WINDOW
    # oracle_sql() must present the same leading order: the driver zips
    # the two dicts by position as well as by name
    oracle_window = [n for n in entry.oracle_sql() if n in set(entry._WINDOW)]
    assert oracle_window[:50] == entry._WINDOW


def test_no_registered_query_is_dropped_by_the_window():
    assert set(entry.queries()) == set(entry._QUERIES)
    assert set(entry.oracle_sql()) == set(entry._ORACLES)


def test_windowed_schemas_are_flat(spark):
    """Driver canonicalizer contract: the driver sorts raw result cells,
    so a windowed query must never return a top-level ArrayType /
    MapType / StructType column (unhashable in pandas factorize — the
    exact failure that turned round 3's bit-exact ``vrl_closures`` row
    red). Nested values must be to_json- or digest-serialized, the
    ``seq_pack_tokens`` convention."""
    import os

    from pyspark.sql.types import ArrayType, MapType, StructType

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    qs = entry.queries()
    offenders = []
    for name in entry._WINDOW:
        df = qs[name](spark, sf)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert offenders == [], (
        f"windowed queries returning nested top-level columns: {offenders}"
    )
