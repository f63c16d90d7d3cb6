#!/usr/bin/env python3
"""Dev-only oracle self-check (mimics the driver's DuckDB compare).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [namePrefix...]

Reads oracle_sql.json from the verify output dir, runs each oracle SQL in
DuckDB against the same parquet tables, loads the Spark result parquet, then
compares as pandas DataFrames: columns sorted by name, rows sorted by all
values, values stringified — AND pandas dtypes compared, because the
driver's hash is dtype-sensitive (DuckDB HUGEINT sums land as float64/object
while Spark writes int64; Spark size() is int32 vs BIGINT int64).

NOT part of the shipped library — uses driver-side python deps.
"""
import json, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonicalization: columns sorted by name, rows sorted."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell(v):
    if isinstance(v, float):
        return repr(v)
    return (v is None, str(v))


def main(sf_dir, out_dir, prefixes):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: row count spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        # kind-level compare: the driver stringifies values, so int width
        # (int32/int64) and datetime unit (ns/us) don't matter — but
        # float-vs-int does ("1.0" vs "1"), which is how DuckDB HUGEINT
        # sums (-> float64) broke 11 queries in rounds 1-2.
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns
                  if got[c].dtype.kind != want[c].dtype.kind]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch (col, spark, oracle): {dt_bad}")
            n_bad += 1
            continue
        cg = [[cell(v) for v in row] for row in got.itertuples(index=False)]
        cw = [[cell(v) for v in row] for row in want.itertuples(index=False)]
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
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
