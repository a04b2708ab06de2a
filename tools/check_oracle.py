#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (rows, schema-ish, values)
against the Spark-written parquet in the verify out dir.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail, ok, skip = [], [], []
for name in sorted(glob.glob(f"{outdir}/q_*")):
    q = name.split("/")[-1]
    files = glob.glob(f"{name}/*.parquet")
    if not files:
        fail.append((q, "no spark output")); continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if q not in oracle:
        skip.append((q, len(spark_df))); continue
    try:
        duck_df = con.sql(oracle[q]).df()
    except Exception as e:
        fail.append((q, f"oracle SQL error: {e}")); continue
    a = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    b = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(a.columns) != list(b.columns):
        fail.append((q, f"cols {list(a.columns)} vs {list(b.columns)}")); continue
    if len(a) != len(b):
        fail.append((q, f"rows {len(a)} vs {len(b)}")); continue
    bad = None
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            if not np.array_equal(av.astype(float), bv.astype(float), equal_nan=True):
                i = np.where(~((av.astype(float) == bv.astype(float)) |
                               (pd.isna(av) & pd.isna(bv))))[0][:3]
                bad = f"col {c} diff at rows {i.tolist()}: {av[i]} vs {bv[i]}"; break
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                i = np.where(pd.Series(av).astype(str) != pd.Series(bv).astype(str))[0][:3]
                bad = f"col {c} diff at rows {i.tolist()}: {av[i]} vs {bv[i]}"; break
    if bad: fail.append((q, bad))
    else: ok.append((q, len(a)))

print(f"== OK ({len(ok)}):")
for q, n in ok: print(f"  {q}: {n} rows")
print(f"== NO-ORACLE rows-only ({len(skip)}):")
for q, n in skip: print(f"  {q}: {n} rows")
print(f"== FAIL ({len(fail)}):")
for q, msg in fail: print(f"  {q}: {msg}")
sys.exit(1 if fail else 0)
