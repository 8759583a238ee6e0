#!/usr/bin/env python3
"""Exact value-level compare of two Verify dumps (the pin determinism
witness: run Verify twice in fresh JVMs — e.g. SPARK_GRAFT_CPUS=8 vs
32 — and require bit-identical sorted outputs before pinning).

Usage: python3 tools/dumpdiff.py <dumpA> <dumpB> [query...]
"""
import math
import os
import sys

import duckdb

a, b = sys.argv[1], sys.argv[2]
queries = sys.argv[3:] or sorted(
    q for q in os.listdir(a)
    if os.path.isdir(os.path.join(a, q)) and os.path.isdir(
        os.path.join(b, q)))
bad = 0
for q in queries:
    ra = duckdb.sql(f"SELECT * FROM '{a}/{q}/*.parquet' ORDER BY ALL").fetchall()
    rb = duckdb.sql(f"SELECT * FROM '{b}/{q}/*.parquet' ORDER BY ALL").fetchall()
    if len(ra) != len(rb):
        print(f"DIFF {q}: rows {len(ra)} vs {len(rb)}")
        bad += 1
        continue

    def eq(x, y):
        if isinstance(x, float) and isinstance(y, float):
            return (x == y) or (math.isnan(x) and math.isnan(y))
        if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
            return len(x) == len(y) and all(eq(p, r) for p, r in zip(x, y))
        return x == y

    mismatch = next((i for i, (x, y) in enumerate(zip(ra, rb))
                     if not eq(x, y)), None)
    if mismatch is not None:
        print(f"DIFF {q}: first sorted-row mismatch at {mismatch}:")
        print(f"  A: {ra[mismatch]}")
        print(f"  B: {rb[mismatch]}")
        bad += 1
    else:
        print(f"identical {q} ({len(ra)} rows)")
print(f"== {len(queries) - bad} identical, {bad} differ ==")
sys.exit(1 if bad else 0)
