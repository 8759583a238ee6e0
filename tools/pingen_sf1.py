#!/usr/bin/env python3
"""Generate complete SELECT-over-VALUES sf1 pin oracles from a Verify
dump (r14).

Usage: python3 tools/pingen_sf1.py <verify_out_dir> <query> [...]

For each query, reads <dump>/<query>/*.parquet and emits
src/main/resources/graft/pins/oracle_sf1_<query>.txt — a complete
DuckDB SELECT whose VALUES replay the dump exactly:

  - DOUBLE columns as dyadic  m*power(2.0,e)  (DuckDB's decimal float
    parse can be off by one ulp; dyadic arithmetic parses exactly)
  - FLOAT columns as CAST(dyadic AS FLOAT) (the double holds the
    float exactly, so the round-trip is lossless)
  - BIGINT/INT/VARCHAR/DATE/BOOLEAN with explicit casts so the dtype
    compare in tools/check.py matches the Spark dump

The pin is only generated AFTER proving the dump 8-vs-32-thread
identical in fresh JVMs (the text_quality_model recipe, pingen.py).
Wire-up: the query's oracle entry wraps with Pins.sf1Or(name, ...),
which serves this file verbatim when graft.pin.sf targets sf1.
"""
import math
import os
import sys

import duckdb

RES = "src/main/resources/graft/pins"


def dy(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "'NaN'::DOUBLE"
    if v == 0.0:
        return "0.0"
    m, e = math.frexp(v)
    mi = int(m * (1 << 53))
    ee = e - 53
    assert mi * (2.0 ** ee) == v, v
    return f"{mi}*power(2.0,{ee})"


def lit(v, typ):
    if v is None:
        return "NULL"
    t = typ.upper()
    if t == "DOUBLE":
        return dy(float(v))
    if t == "FLOAT":
        return dy(float(v))  # column-level CAST(... AS FLOAT) rounds back
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
             "UBIGINT", "UINTEGER"):
        return str(int(v))
    if t == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if t == "DATE":
        return f"DATE '{v}'"
    if t.startswith("TIMESTAMP"):
        return f"TIMESTAMP '{v}'"
    if t == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if t.endswith("[]"):
        inner = t[:-2]
        return "[" + ",".join(lit(x, inner) for x in v) + "]"
    raise SystemExit(f"unhandled type {typ}")


def cast_expr(i, name, typ):
    t = typ.upper()
    m = {"BIGINT": "BIGINT", "INTEGER": "INT", "DOUBLE": "DOUBLE",
         "FLOAT": "FLOAT", "VARCHAR": "VARCHAR", "DATE": "DATE",
         "BOOLEAN": "BOOLEAN", "SMALLINT": "SMALLINT"}
    if t.startswith("TIMESTAMP"):
        cast = "TIMESTAMP"
    elif t.endswith("[]"):
        cast = t
    else:
        cast = m[t]
    return f'CAST(col{i} AS {cast}) AS "{name}"'


def gen(dump, query):
    rel = f"'{dump}/{query}/*.parquet'"
    desc = duckdb.sql(f"DESCRIBE SELECT * FROM {rel}").fetchall()
    cols = [(c[0], c[1]) for c in desc]
    rows = duckdb.sql(f"SELECT * FROM {rel} ORDER BY ALL").fetchall()
    assert rows, f"{query}: empty dump (vacuous pin)"
    sel = ", ".join(cast_expr(i, n, t) for i, (n, t) in enumerate(cols))
    out = [f"SELECT {sel} FROM (VALUES"]
    body = [
        "(" + ",".join(lit(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows
    ]
    out.append(",\n".join(body))
    out.append(") t")
    path = f"{RES}/oracle_sf1_{query}.txt"
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"{query}: {len(rows)} rows, {len(cols)} cols -> {path}")


def gen_picks(dump, query):
    """ANN family: pin only the (query_id, cand_id, rank) picks; the
    oracle (VectorQueries.pinnedAnnOracle) re-derives the cosines from
    the sf1 parquet, keeping the sf1 gate non-circular."""
    rel = f"'{dump}/{query}/*.parquet'"
    rows = duckdb.sql(f"SELECT query_id, cand_id, rank FROM {rel} "
                      "ORDER BY query_id, rank").fetchall()
    assert rows, f"{query}: empty dump"
    path = f"{RES}/{query}_picks_sf1.txt"
    with open(path, "w") as f:
        f.write("\n".join(f"({q},{c},{r})" for q, c, r in rows) + "\n")
    print(f"{query}: {len(rows)} picks -> {path}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--picks"]
    picks = "--picks" in sys.argv
    dump = args[0]
    queries = args[1:] or sorted(
        d for d in os.listdir(dump)
        if os.path.isdir(os.path.join(dump, d)))
    for q in queries:
        (gen_picks if picks else gen)(dump, q)
