#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata parquet, comparing row count, sorted
column names, and sorted cell values (floats to 1e-9 by default).

Usage: python3 tools/check.py [--exact] <sfDir> <verifyOutDir> [query ...]

--exact: compare floats bit-for-bit (repr equality, no rounding) and
distinguish value TYPES (int vs Decimal vs float), matching the
driver's hash gate strictness. The closing §8 sweep must use this
mode — the default 1e-9 rounding is for mid-round float triage only.
"""
import json, math, sys, glob, os

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EXACT = False


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if EXACT:
            # repr distinguishes every double bit pattern incl. -0.0
            return ("f", repr(v))
        return ("f", round(v, 9))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat().replace("+00:00", ""))
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return (type(v).__name__[0], v)


def rows_of(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [cols[i] for i in order]
    return sorted(tuple(norm(c[r]) for c in cols) for r in range(len(cols[0]) if cols else 0))


def main():
    global EXACT
    args = sys.argv[1:]
    if args and args[0] == "--exact":
        EXACT = True
        args = args[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; Spark-written scale-up
        # dirs (graft.tools.ScaleData) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(files)
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        s_names = sorted(c.lower() for c in spark_tbl.column_names)
        d_names = sorted(c.lower() for c in duck.column_names)
        if s_names != d_names:
            print(f"FAIL {name}: columns {s_names} != {d_names}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} != {duck.num_rows}")
            n_fail += 1
            continue
        s_rows = rows_of([c.to_pylist() for c in spark_tbl.columns], spark_tbl.column_names)
        d_rows = rows_of([c.to_pylist() for c in duck.columns], duck.column_names)
        if s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:\n  spark {s_rows[bad]}\n  duck  {d_rows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({spark_tbl.num_rows} rows)")
        n_pass += 1
    mode = "exact" if EXACT else "1e-9"
    print(f"== {n_pass} pass, {n_fail} fail (floats: {mode}) ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
