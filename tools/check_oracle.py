#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs each SparkEntry query's parquet dump (produced by `sbt "runMain
graft.Verify <sfDir> <outDir>"`) against the corresponding oracle SQL
executed by DuckDB over the raw testdata parquet, and compares:
schema (column names + kinds), row count, and value equality after
sorting columns by name and rows by all columns.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys
import glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # decimals/lists → canonical string
            df[c] = df[c].apply(
                lambda v: str(sorted(v)) if isinstance(v, (list, np.ndarray)) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_kind(dt) -> str:
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "ts"
    return "obj"


def driver_hazards(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list:
    """Checks the DRIVER's comparator enforces but the value compare below
    would hide. (a) dtype-KIND mismatch: the driver's hash stringifies
    values dtype-sensitively, so Spark int64 `4` vs a DuckDB
    HUGEINT→float64 `4.0` hash-mismatches even when every value is equal
    (the r8/r9 q64 red row — cast oracle sums to BIGINT). (b) array-typed
    output columns: the driver sorts rows by every column and pandas cannot
    factorize ndarrays, so an array column crashes the whole compare (the
    r9 q80 error — emit scalar digests instead)."""
    problems = []
    for c in set(got.columns) & set(want.columns):
        gk, wk = dtype_kind(got[c].dtype), dtype_kind(want[c].dtype)
        if gk != wk:
            problems.append(f"dtype kind mismatch on {c}: spark={got[c].dtype} oracle={want[c].dtype}")
    for side, df in (("spark", got), ("oracle", want)):
        for c in df.columns:
            if df[c].dtype == object and len(df) and isinstance(
                    df[c].dropna().iloc[0] if df[c].notna().any() else None,
                    (list, np.ndarray)):
                problems.append(f"array-typed column {c} in {side} output (driver sort would crash)")
    return problems


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        hazards = driver_hazards(name, got, want)
        if hazards:
            for h in hazards:
                print(f"[FAIL] {name}: {h}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        mismatched = []
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = eq
            else:
                exact = a.astype(str).equals(b.astype(str))
            if not exact:
                mismatched.append(c)
        if mismatched:
            print(f"[FAIL] {name}: value mismatch in {mismatched}")
            for c in mismatched[:2]:
                diff = g[c].astype(str) != w[c].astype(str)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"    row {i} col {c}: got={g[c][i]!r} want={w[c][i]!r}")
            failures += 1
        else:
            print(f"[ ok ] {name}: {len(g)} rows, {len(g.columns)} cols")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
