"""Local stand-in for the driver's correctness gate: run every
``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on DuckDB over
the same parquet testdata, compare row count + schema width + order-
insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from vector_spark.session import get_spark
from vector_spark.tables import TESTDATA_TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: str(v) if v is not None else "<null>")
        elif str(col.dtype).startswith(("float", "Float")):
            df[c] = col.round(6).map(lambda v: "<null>" if pd.isna(v) else f"{v:.6f}")
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").map(str)
        else:
            df[c] = col.map(lambda v: "<null>" if pd.isna(v) else str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rowcount spark={len(got)} duckdb={len(want)}")
            failures += 1
            continue
        gd = {c.lower(): str(got[c].dtype) for c in got.columns}
        wd = {c.lower(): str(want[c].dtype) for c in want.columns}
        dtype_mismatch = {
            c: (gd[c], wd[c]) for c in gd if c in wd and gd[c] != wd[c]
        }
        if dtype_mismatch:
            print(f"DTYPE {name}: {dtype_mismatch}")
        if sorted(map(str.lower, got.columns)) != sorted(map(str.lower, want.columns)):
            print(
                f"FAIL {name}: columns spark={sorted(got.columns)} "
                f"duckdb={sorted(want.columns)}"
            )
            failures += 1
            continue
        want.columns = [c for c in want.columns]
        g, w = normalize(got), normalize(want.rename(columns=dict(zip(sorted(want.columns, key=str.lower), sorted(got.columns, key=str.lower)))))
        if g.equals(w):
            print(f"OK   {name}: {len(got)} rows")
        else:
            diff = (g != w).any(axis=1)
            print(f"FAIL {name}: value mismatch in {int(diff.sum())}/{len(g)} rows")
            mism = diff[diff].index[:3]
            for i in mism:
                print(f"  spark : {g.loc[i].to_dict()}")
                print(f"  duckdb: {w.loc[i].to_dict()}")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
