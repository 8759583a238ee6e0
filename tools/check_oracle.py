#!/usr/bin/env python3
"""Local oracle harness: mimic the driver's DuckDB compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Loads each query's Spark result (parquet written by graft.Verify), runs
the corresponding oracle SQL in DuckDB over the same tables, sorts
columns by name and rows by value, and compares exactly. Reports
per-query PASS/FAIL with max float deviation on mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        got_t = {c: str(got[c].dtype) for c in got.columns}
        exp_t = {c: str(exp[c].dtype) for c in exp.columns}
        mismatch = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                import numpy as np
                ga, ea = g.astype(float).values, e.astype(float).values
                both_nan = pd.isna(ga) & pd.isna(ea)
                neq = ~both_nan & (ga != ea)
                if neq.any():
                    d = abs(ga[neq] - ea[neq])
                    mismatch.append(f"{c}: {neq.sum()} diffs, maxdev={d.max():.3e}")
            else:
                if not g.astype(str).equals(e.astype(str)):
                    n = (g.astype(str) != e.astype(str)).sum()
                    mismatch.append(f"{c}: {n} value diffs (types {got_t[c]} vs {exp_t[c]})")
        if mismatch:
            print(f"VALUES   {name}: " + "; ".join(mismatch))
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
