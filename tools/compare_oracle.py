#!/usr/bin/env python3
"""Local oracle gate (driver-style): compare graft.Verify parquet dumps
against the DuckDB oracle SQL. Usage:
    python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
Checks per query: row count, column names (sorted), and value equality
on column-sorted + row-sorted frames (string-normalized)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("documents", "lineitem", "orders", "customer", "embeddings",
          "events", "nation", "part", "region", "supplier"):
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
npass = nfail = 0
for name in sorted(oracle):
    try:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        sp = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        ora = con.execute(oracle[name]).fetchdf()
        cols_sp, cols_or = sorted(sp.columns), sorted(ora.columns)
        if cols_sp != cols_or:
            print(f"FAIL {name}: schema {cols_sp} vs {cols_or}"); nfail += 1; continue
        if len(sp) != len(ora):
            print(f"FAIL {name}: rows {len(sp)} vs {len(ora)}"); nfail += 1; continue
        def norm(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:  # normalize dtypes for string compare
                if df[c].dtype.kind == "f":
                    df[c] = df[c].map(lambda v: f"{v:.9g}")
                else:
                    df[c] = df[c].astype(str)
            return df.sort_values(by=list(df.columns)).reset_index(drop=True)
        a, b = norm(sp), norm(ora)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([a[diff].head(3), b[diff].head(3)], keys=["spark", "oracle"]))
            nfail += 1; continue
        npass += 1
    except Exception as e:
        print(f"FAIL {name}: {e}"); nfail += 1
print(f"{npass} pass / {nfail} fail of {len(oracle)}")
sys.exit(1 if nfail else 0)
