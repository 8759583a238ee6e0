#!/usr/bin/env python3
"""Generate pinned-oracle literals from a Verify dump.

Usage: python3 tools/pingen.py <verify_out_dir> <query> [--fmt=...]

Formats (pick per query shape):
  ann      (query_id, cand_id, rank) picks   -> Scala Seq tuples
  dyadic1  (id, double)                      -> VALUES with m*2^e
  dyadic2  (id, long, double-or-null)        -> VALUES with m*2^e
  values   all columns, ints + exact-decimal doubles -> CAST VALUES

The dyadic encoding (mantissa * power(2.0, e)) parses EXACTLY in
DuckDB where its decimal float parse can be off by one ulp; emit it
for any pinned double that is not known to be decimal-exact.

Workflow (the text_quality_model recipe): prove two fresh-JVM runs
(SPARK_GRAFT_CPUS=8 and =32) byte-identical at the target SF, then
pin. Dual-SF pins route through graft.queries.Pins.at — Verify stamps
graft.pin.sf so each dump carries its own SF's pin set.
"""
import math, sys

import duckdb


def dy(v):
    if v is None:
        return "NULL"
    if v == 0.0:
        return "0.0"
    m, e = math.frexp(v)
    mi = int(m * (1 << 53))
    ee = e - 53
    assert mi * (2.0 ** ee) == v, v
    return f"{mi}*power(2.0,{ee})"


def wrap_margin(vals, width=58, indent="      "):
    lines, cur = [], ""
    for v in vals:
        piece = v + ","
        if cur and len(cur) + len(piece) > width:
            lines.append(cur)
            cur = piece
        else:
            cur += piece
    if cur:
        lines.append(cur)
    lines[-1] = lines[-1].rstrip(",")
    body = '    """' + lines[0] + "\n"
    for l in lines[1:]:
        body += "      |" + l + "\n"
    return body.rstrip("\n") + '""".stripMargin.replace("\\n", " ")'


def main():
    out_dir, query = sys.argv[1], sys.argv[2]
    fmt = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--fmt=")), "values")
    rel = f"'{out_dir}/{query}/*.parquet'"
    cols = [c[0] for c in duckdb.sql(
        f"DESCRIBE SELECT * FROM {rel}").fetchall()]
    rows = duckdb.sql(
        f"SELECT * FROM {rel} ORDER BY ALL").fetchall()
    print(f"// {query}: {len(rows)} rows, cols={cols}")
    if fmt == "ann":
        rows = duckdb.sql(f"SELECT query_id, cand_id, rank FROM {rel} "
                          "ORDER BY query_id, rank").fetchall()
        vals = [f"({q},{c},{r})" for q, c, r in rows]
        import textwrap
        print("\n".join(textwrap.wrap(
            ", ".join(vals), width=68,
            initial_indent="      ", subsequent_indent="      ")))
    elif fmt == "dyadic1":
        print(wrap_margin([f"({r[0]},{dy(r[1])})" for r in rows]))
    elif fmt == "dyadic2":
        print(wrap_margin(
            [f"({r[0]},{r[1]},{dy(r[2])})" for r in rows]))
    elif fmt == "values":
        def cell(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return dy(v)
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return str(v)
        print(wrap_margin(
            ["(" + ",".join(cell(v) for v in r) + ")" for r in rows],
            width=66))
    else:
        sys.exit(f"unknown fmt {fmt}")


if __name__ == "__main__":
    main()
