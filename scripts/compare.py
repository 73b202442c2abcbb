#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage: compare.py <verifyOutDir> <sfDir>."""
import sys, json, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a stable, engine-neutral compare
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

fails = []
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not os.path.isdir(path):
        fails.append((name, "NO SPARK OUTPUT")); continue
    spark_df = pd.read_parquet(path)
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {e}")); continue
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        fails.append((name, f"COLS spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")); continue
    if len(spark_df) != len(duck_df):
        fails.append((name, f"ROWS spark={len(spark_df)} duck={len(duck_df)}")); continue
    a, b = canon(spark_df), canon(duck_df)
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = neq[neq].index[:3]
        diffs = [f"row{i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}" for i in idx]
        fails.append((name, "VALUES " + " | ".join(diffs))); continue
    print(f"OK   {name} ({len(spark_df)} rows)")

# queries with no oracle: rows-only
import pathlib
for p in sorted(glob.glob(f"{outdir}/*")):
    n = os.path.basename(p)
    if os.path.isdir(p) and n not in oracle:
        rows = len(pd.read_parquet(p))
        print(f"ROWS {n} ({rows} rows, no oracle)")

for name, msg in fails:
    print(f"FAIL {name}: {msg[:500]}")
print(f"\n{len(fails)} failures")
sys.exit(1 if fails else 0)
