#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same testdata tables and compare normalized result sets
(sort columns by name, round doubles, timestamps to micros, sort rows).

Usage: python3 scripts/check_local.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.round(6)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    n = pd.DataFrame(out)
    n = n.sort_values(by=list(n.columns), kind="mergesort").reset_index(drop=True)
    return n

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = normalize(spark_df), normalize(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} oracle={len(b)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            nbad = int(neq.any(axis=1).sum())
            detail = []
            for c in bad_cols[:3]:
                i = int(neq[c].idxmax())
                detail.append(f"{c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}")
            results[name] = f"VALUE_MISMATCH rows={nbad} cols={bad_cols} e.g. {'; '.join(detail)}"
        else:
            results[name] = f"OK({len(a)})"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

main()
