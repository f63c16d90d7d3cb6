#!/usr/bin/env python3
"""Builder-side replica of the driver's DuckDB correctness compare.

Usage:
  python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
      Reads <verifyOutDir>/<q>/ parquet (Spark result) and replays
      <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir tables;
      compares row count, sorted column names, per-column dtype CLASS
      (int vs float vs bool vs datetime vs object), and a value hash
      (columns sorted by name, rows sorted, floats rounded).

  python3 tools/selfcheck.py --typelint <sfDir> <oracle_sql.json>
      Oracle result-TYPE lint (portability class #5, SURVEY 8.4): binds
      every oracle SQL against the sfDir tables WITHOUT executing it and
      fails if any output column's DuckDB type is HUGEINT/UHUGEINT.
      DuckDB silently widens SUM/COALESCE-over-BIGINT chains to HUGEINT,
      pandas converts HUGEINT to float64, Spark ships int64, and the
      driver's float canonicalization then tells "82.0" from "82" —
      exactly how q345/q356 failed round 8 while the %.6g selfcheck canon
      collided them. The allowlist is EMPTY by design: fix the oracle
      with CAST(... AS BIGINT), don't allowlist.

The per-column dtype-class compare in the main mode is the same lint's
runtime twin: it fails a query whose Spark/oracle dtype classes diverge
even when the rounded value hash collides, so the builder sees what the
driver sees."""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle output types that do not survive the DuckDB->pandas->hash trip
# identically to Spark's parquet output. Empty-allowlist policy: cast in
# the oracle SQL instead of adding entries here.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")

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

def dtype_class(dt) -> str:
    """Coarse dtype class: int/float drift is the portability failure mode;
    anything finer (int32 vs int64) canonicalizes identically."""
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "obj"

def connect_views(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def typelint(sf_dir, oracle_json):
    """Bind (not run) every oracle and reject banned output types."""
    con = connect_views(sf_dir)
    with open(oracle_json) as f:
        oracles = json.load(f)
    bad = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            hits = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in BANNED_ORACLE_TYPES]
        except Exception as e:
            print(f"{name}: BIND ERR {e}")
            bad += 1
            continue
        if hits:
            bad += 1
            print(f"{name}: BANNED ORACLE TYPE " +
                  ", ".join(f"{c}:{t}" for c, t in hits) +
                  "  (CAST the column to BIGINT in the oracle SQL)")
    print(f"\ntypelint: {len(oracles)} oracles, {bad} bad")
    return 1 if bad else 0

def main():
    if sys.argv[1] == "--typelint":
        return typelint(sys.argv[2], sys.argv[3])
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
    con = connect_views(sf_dir)
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
            oracle_rel = con.sql(oracles[name])
            banned = [(c, str(t)) for c, t in zip(oracle_rel.columns, oracle_rel.types)
                      if str(t).upper() in BANNED_ORACLE_TYPES]
            oracle_df = oracle_rel.fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            bad += 1
            continue
        r = len(spark_df) == len(oracle_df)
        s = sorted(map(str.lower, spark_df.columns)) == sorted(map(str.lower, oracle_df.columns))
        spark_df.columns = [c.lower() for c in spark_df.columns]
        oracle_df.columns = [c.lower() for c in oracle_df.columns]
        # dtype-class lint: %.6g canon collides float64(82.0) with int64(82),
        # but the driver's canonicalization does not — fail loudly here.
        tmism = []
        if r and s:
            for c in sorted(spark_df.columns):
                ks, ko = dtype_class(spark_df[c].dtype), dtype_class(oracle_df[c].dtype)
                # all-NULL int columns surface as object/float asymmetrically;
                # only flag when both sides have at least one non-null value
                if ks != ko and spark_df[c].notna().any() and oracle_df[c].notna().any():
                    tmism.append(f"{c}: spark={ks} oracle={ko}")
        t = not tmism and not banned
        h = canon(spark_df) == canon(oracle_df) if (r and s) else False
        if r and s and h and t:
            ok += 1
            print(f"{name}: OK ({len(spark_df)} rows)")
        else:
            bad += 1
            print(f"{name}: MISMATCH rows={r}({len(spark_df)}/{len(oracle_df)}) "
                  f"schema={s} hash={h} types={t}")
            if not s:
                print(f"  spark:  {sorted(spark_df.columns)}")
                print(f"  oracle: {sorted(oracle_df.columns)}")
            for m in tmism:
                print(f"  dtype-class drift {m}")
            for c, ty in banned:
                print(f"  banned oracle type {c}:{ty}")
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
