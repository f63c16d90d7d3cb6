#!/usr/bin/env python3
"""Dev-only oracle self-check (mimics the driver's DuckDB compare).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from the verify output dir, runs each oracle SQL in
DuckDB against the same parquet tables, loads the Spark result parquet, then
compares after sorting columns by name and rows by all values.

NOT part of the shipped library — uses driver-side python deps.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; stringify floats at full precision."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = repr(v)
            out.append((v is None, str(v)))
        return out

    return sorted([key(r) for r in rows])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: column mismatch spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_bad += 1
            continue
        cg, cw = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if len(cg) != len(cw):
            print(f"FAIL {name}: row count spark={len(cg)} oracle={len(cw)}")
            n_bad += 1
            continue
        diff = [(a, b) for a, b in zip(cg, cw) if a != b]
        if diff:
            print(f"FAIL {name}: {len(diff)}/{len(cg)} differing rows; first:")
            print(f"  spark : {diff[0][0]}")
            print(f"  oracle: {diff[0][1]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(cg)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
