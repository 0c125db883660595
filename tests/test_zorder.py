"""Z-order layout (sinks/zorder.py): key math vs a Python oracle and the
multi-dimensional pruning claim checked against real parquet footers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.sinks import zorder as z


def _py_morton(vals: list[int], bits: int) -> int:
    n = len(vals)
    cap = (1 << bits) - 1
    acc = 0
    for i, v in enumerate(vals):
        v = min(v, cap)
        for b in range(bits):
            acc += ((v >> b) & 1) << (b * n + i)
    return acc


@pytest.fixture(scope="module")
def grid(spark):
    """32x32 grid, 10 rows per cell; the dimensions are INDEPENDENT
    (day = i mod 32, src = i div 32 mod 32) — a key requirement for the
    control assertion, since a src functionally determined by day would
    let a day-sort cluster src for free."""
    return spark.range(10_240).select(
        F.col("id").alias("i"),
        (F.col("id") % 32).alias("day"),
        ((F.col("id") / 32).cast("long") % 32).alias("src"),
    ).cache()


def test_key_matches_python_oracle(spark, grid):
    rows = grid.withColumn("z", z.zorder_key(["day", "src"], bits=5)).collect()
    for r in rows:
        assert r.z == _py_morton([r.day, r.src], 5)


def test_key_clamps_instead_of_overflowing(spark):
    df = spark.range(1).select(F.lit(1 << 40).alias("a"), F.lit(3).alias("b"))
    row = df.select(z.zorder_key(["a", "b"], bits=4).alias("z")).collect()[0]
    assert row.z == _py_morton([15, 3], 4)
    with pytest.raises(ValueError, match="BIGINT"):
        z.zorder_key(["a", "b", "a", "b"], bits=16)


def test_sql_mirror_matches(spark, grid):
    import duckdb

    pdf = grid.withColumn("z", z.zorder_key(["day", "src"], bits=5)).toPandas()
    expr = z.zorder_key_sql(["day", "src"], bits=5)
    want = duckdb.sql(f"SELECT i, {expr} AS z FROM pdf ORDER BY i").df()
    got = pdf.sort_values("i").reset_index(drop=True)
    assert (got["z"].to_numpy() == want["z"].to_numpy()).all()


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    """The load-bearing claim: after z-order layout, a point filter on
    EITHER dimension overlaps a strict subset of files (single-column
    sort gives this for one dimension only — shown as the control)."""
    zp, lp = str(tmp_path / "zord"), str(tmp_path / "linear")
    z.zorder_write(grid, zp, ["day", "src"], n_files=16, bits=5)
    (
        grid.repartitionByRange(16, "day")
        .sortWithinPartitions("day")
        .write.parquet(lp)
    )

    zr = z.file_stat_ranges(zp, ["day", "src"])
    lr = z.file_stat_ranges(lp, ["day", "src"])
    assert len(zr) == 16

    # z-order: both dimensions prune (≈ sqrt(F) of F files each)
    assert z.files_overlapping(zr, "day", 5) <= 8
    assert z.files_overlapping(zr, "src", 5) <= 8
    # linear sort: day prunes hard, src reads everything
    assert z.files_overlapping(lr, "day", 5) <= 2
    assert z.files_overlapping(lr, "src", 5) == len(lr)

    # layout never changes data
    back = spark.read.parquet(zp).filter(F.col("day") == 5)
    assert sorted(r.i for r in back.collect()) == sorted(
        r.i for r in grid.filter(F.col("day") == 5).collect()
    )
