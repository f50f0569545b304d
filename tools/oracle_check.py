#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name and rows by value, and compares cell-by-cell.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
from decimal import Decimal

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def dtype_kind(col_: pd.Series) -> str:
    """Coarse dtype class so STRING-vs-BIGINT drift fails locally (the
    driver's hash is dtype-sensitive; stringifying cells hid this)."""
    k = col_.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    # object column: classify by first non-null value
    nn = col_.dropna()
    if len(nn) == 0:
        return "empty"
    v = nn.iloc[0]
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "string"
    return type(v).__name__

def dtypes_of(df: pd.DataFrame) -> dict:
    return {c: dtype_kind(df[c]) for c in df.columns}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    def norm(v):
        if isinstance(v, Decimal):
            return str(v)
        if isinstance(v, float):
            return repr(v)
        return str(v)
    df = df.apply(lambda col_: col_.map(norm))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fail = 0
for name in sorted(oracles):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"MISSING {name}: no spark output"); fail += 1; continue
    try:
        got_raw = pd.read_parquet(spark_path)
        want_raw = con.execute(oracles[name]).df()
        got, want = canon(got_raw), canon(want_raw)
    except Exception as e:
        print(f"ERROR   {name}: {e}"); fail += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA  {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
        fail += 1; continue
    gd, wd = dtypes_of(got_raw[sorted(got_raw.columns)]), dtypes_of(want_raw[sorted(want_raw.columns)])
    mismatched = {c: (gd[c], wd[c]) for c in gd
                  if gd[c] != wd[c] and "empty" not in (gd[c], wd[c])}
    if mismatched:
        print(f"DTYPE   {name}: spark-vs-duckdb {mismatched}")
        fail += 1; continue
    if len(got) != len(want):
        print(f"ROWS    {name}: spark={len(got)} duckdb={len(want)}"); fail += 1; continue
    if not got.equals(want):
        diff = (got != want).any(axis=1)
        print(f"VALUES  {name}: {diff.sum()} mismatched rows of {len(got)}")
        print(" spark :", got[diff].head(3).to_dict("records"))
        print(" duckdb:", want[diff].head(3).to_dict("records"))
        fail += 1; continue
    print(f"OK      {name} ({len(got)} rows)")

rows_only = [n for n in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, n)) and n not in oracles]
for name in sorted(rows_only):
    try:
        n = len(pd.read_parquet(os.path.join(out_dir, name)))
        print(f"ROWSONLY {name}: {n} rows")
    except Exception as e:
        print(f"ROWSONLY {name}: ERROR {e}")

print(f"\n{'FAIL' if fail else 'PASS'}: {len(oracles) - fail}/{len(oracles)} oracle matches")
sys.exit(1 if fail else 0)
