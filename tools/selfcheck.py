#!/usr/bin/env python3
"""Builder-side replica of the driver's DuckDB correctness compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
Reads <verifyOutDir>/<q>/ parquet (Spark result) and replays
<verifyOutDir>/oracle_sql.json in DuckDB over the sfDir tables; compares
row count, sorted column names, and a value hash (columns sorted by name,
rows sorted, floats rounded)."""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                vals.append("[" + ",".join(
                    f"{x:.6g}" if isinstance(x, float) else str(x) for x in v) + "]")
            elif isinstance(v, bytes):
                vals.append(hashlib.md5(v).hexdigest())
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # record the compare environment (SURVEY 8.4): hash mismatches against
    # the driver are diagnosable only if we know WHICH duckdb/pandas this
    # selfcheck ran — the round-7 q265/q266 flips were a driver-side
    # DuckDB-build rounding difference invisible without this.
    try:
        os.makedirs("target", exist_ok=True)
        with open("target/bench_env.json", "w") as f:
            json.dump({"duckdb": duckdb.__version__,
                       "pandas": pd.__version__,
                       "python": sys.version.split()[0]}, f)
    except OSError:
        pass
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    ok = bad = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            bad += 1
            continue
        r = len(spark_df) == len(oracle_df)
        s = sorted(map(str.lower, spark_df.columns)) == sorted(map(str.lower, oracle_df.columns))
        spark_df.columns = [c.lower() for c in spark_df.columns]
        oracle_df.columns = [c.lower() for c in oracle_df.columns]
        h = canon(spark_df) == canon(oracle_df) if (r and s) else False
        if r and s and h:
            ok += 1
            print(f"{name}: OK ({len(spark_df)} rows)")
        else:
            bad += 1
            print(f"{name}: MISMATCH rows={r}({len(spark_df)}/{len(oracle_df)}) "
                  f"schema={s} hash={h}")
            if not s:
                print(f"  spark:  {sorted(spark_df.columns)}")
                print(f"  oracle: {sorted(oracle_df.columns)}")
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
