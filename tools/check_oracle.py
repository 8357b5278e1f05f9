#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfDir> <out>"`
plus <out>/oracle_sql.json, runs each oracle in DuckDB over the same tables,
sorts columns by name, rounds doubles to 6 decimals, and compares row-wise.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.reset_index(drop=True)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # driver data is one file per table; DataGen (Spark) writes a
        # directory of part files — glob the parts in that case
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    all_dirs = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    # r17 gate hole: a query that THROWS during the Verify dump leaves no
    # directory at all and used to vanish from this compare entirely (the
    # star leg's q109 DIVIDE_BY_ZERO was invisible for one full run).
    # Every declared oracle key must have a dump — a missing one is a
    # Spark-side failure, not a skip.
    for name in sorted(set(oracle) - set(all_dirs)):
        print(f"  {name}: MISSING SPARK DUMP (query threw during Verify?)")
        n_fail += 1
    for name in all_dirs:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"  {name}: NO SPARK OUTPUT"); n_fail += 1; continue
        sdf = pd.read_parquet(f"{out}/{name}")
        if name not in oracle:
            print(f"  {name}: rows-only ({len(sdf)} rows)" +
                  (" EMPTY!" if len(sdf) == 0 else ""))
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {str(e)[:200]}"); n_fail += 1; continue
        s, o = norm(sdf), norm(odf)
        if list(s.columns) != list(o.columns):
            print(f"  {name}: COLUMN MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}")
            n_fail += 1; continue
        bad = []
        # The driver's hasher is dtype-sensitive: a DuckDB HUGEINT (windowed
        # SUM of ints) comes back as float64 and hash-mismatches an int64
        # Spark column even when values agree (q24c round 1). Flag it here.
        dt = [c for c in s.columns
              if {s[c].dtype.kind, o[c].dtype.kind} == {"f", "i"}]
        if dt:
            print(f"  {name}: DTYPE MISMATCH (int vs float — driver hash would fail): " +
                  ", ".join(f"{c} spark={s[c].dtype} oracle={o[c].dtype}" for c in dt))
            n_fail += 1; continue
        for c in s.columns:
            a, b = s[c], o[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a.fillna(np.nan).values == b.fillna(np.nan).values) | \
                     (pd.isna(a).values & pd.isna(b).values)
            else:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row {i}]: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
        if bad:
            print(f"  {name}: VALUE MISMATCH ({len(bad)} cols): " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"  {name}: OK ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(all_dirs) - n_pass - n_fail} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
