"""Enrichment option paths + Iceberg gate fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.enrich import enrich, validate_unique_key
from vector_spark.sources.iceberg import iceberg_available, read_input, write_output


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [(1, "APP"), (2, "web"), (3, "nope")], "id long, src string"
    )


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [("app", "team-a", 1), ("web", "team-w", 2)],
        "src string, team string, tier int",
    )


def test_enrich_case_insensitive(spark, facts, dim):
    out = {r.id: r.team for r in enrich(
        facts, dim, on=["src"], case_insensitive=True
    ).collect()}
    assert out == {1: "team-a", 2: "team-w", 3: None}


def test_enrich_case_sensitive_misses(spark, facts, dim):
    out = {r.id: r.team for r in enrich(facts, dim, on=["src"]).collect()}
    assert out == {1: None, 2: "team-w", 3: None}


def test_enrich_required_drops_unmatched(spark, facts, dim):
    out = enrich(facts, dim, on=["src"], required=True)
    assert sorted(r.id for r in out.collect()) == [2]


def test_enrich_select_projection(spark, facts, dim):
    out = enrich(facts, dim, on=["src"], select=["team"])
    assert "tier" not in out.columns and "team" in out.columns


def test_enrich_unique_key_contract(spark, facts):
    dup = spark.createDataFrame(
        [("app", "t1"), ("app", "t2")], "src string, team string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        enrich(facts, dup, on=["src"], validate=True)
    validate_unique_key(dup.limit(1), ["src"])  # single row passes


def test_iceberg_gate_falls_back_to_parquet(spark, tmp_path):
    assert iceberg_available(spark) is False  # no iceberg jars in sandbox
    df = spark.range(10).withColumn("r", F.col("id") % 3)
    p = str(tmp_path / "t")
    write_output(df, p, partition_by=["r"])
    back = read_input(spark, p)
    assert back.count() == 10
    assert (tmp_path / "t" / "r=0").exists()  # partitioned parquet layout
