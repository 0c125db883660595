"""Datadog search syntax compiler: grammar parity cases.

Mirrors the behaviors of reference src/conditions/datadog_search.rs
(facet equality, wildcard, default-field substring, boolean ops,
comparisons, ranges, existence) on a tiny frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.conditions import to_column
from vector_spark.datadog_search import compile_datadog_search


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "error", "web-01", 5.0, "disk full error on /dev/sda"),
        (2, "info", "web-02", 17.5, "request ok"),
        (3, "error", "db-01", 30.0, "timeout talking to upstream"),
        (4, "view", None, 2.0, "page view"),
        (5, "audit", "web-01", 15.0, None),
    ]
    return spark.createDataFrame(
        rows, "id long, event_type string, host string, value double, message string"
    )


def ids(df, q, **kw):
    return sorted(
        r.id for r in df.filter(compile_datadog_search(q, **kw)).collect()
    )


def test_facet_equality_and_quotes(df):
    assert ids(df, "event_type:error") == [1, 3]
    assert ids(df, 'event_type:"error"') == [1, 3]
    assert ids(df, "value:30.0") == [3]


def test_wildcards(df):
    assert ids(df, "host:web*") == [1, 2, 5]
    assert ids(df, "host:*-01") == [1, 3, 5]
    assert ids(df, "event_type:*o*") == [1, 2, 3]  # errOr, infO
    assert ids(df, "event_type:a*") == [5]


def test_boolean_ops_and_adjacency(df):
    assert ids(df, "event_type:error AND host:db-01") == [3]
    assert ids(df, "event_type:error host:db-01") == [3]  # adjacency = AND
    assert ids(df, "event_type:error OR event_type:view") == [1, 3, 4]
    assert ids(df, "NOT event_type:error") == [2, 4, 5]
    assert ids(df, "-event_type:error") == [2, 4, 5]
    assert ids(df, "(event_type:error OR event_type:info) AND host:web*") == [1, 2]


def test_comparisons_and_ranges(df):
    assert ids(df, "value:>15") == [2, 3]
    assert ids(df, "value:>=15") == [2, 3, 5]
    assert ids(df, "value:[5 TO 17.5]") == [1, 2, 5]


def test_existence(df):
    assert ids(df, "_exists_:host") == [1, 2, 3, 5]
    assert ids(df, "_missing_:host") == [4]


def test_default_field_terms(df):
    assert ids(df, "timeout") == [3]
    assert ids(df, '"disk full"') == [1]
    assert ids(df, "error", default_field="event_type") == [1, 3]
    assert ids(df, "upstr*m") == []  # wildcard terms use LIKE, not substring
    assert ids(df, "*upstream*") == [3]


def test_match_all_and_empty(df):
    assert ids(df, "*") == [1, 2, 3, 4, 5]
    assert ids(df, "   ") == [1, 2, 3, 4, 5]


def test_dict_condition_routing(df):
    c = to_column({"type": "datadog_search", "source": "event_type:error"})
    assert sorted(r.id for r in df.filter(c).collect()) == [1, 3]
    c2 = to_column({"type": "vrl", "source": '.event_type == "error"'})
    assert sorted(r.id for r in df.filter(c2).collect()) == [1, 3]
    with pytest.raises(ValueError):
        to_column({"type": "nope", "source": "x"})


def test_bad_syntax_raises(df):
    with pytest.raises(ValueError):
        compile_datadog_search("(unbalanced")
