#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf
tables, sorts columns by name (like the driver), and compares values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)))
n_pass = n_fail = n_noracle = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(got)} rows")
        n_noracle += 1
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"  [FAIL-cols] {name}: spark={list(got.columns)} "
              f"duck={list(exp.columns)}")
        n_fail += 1
        continue
    if len(got) != len(exp):
        print(f"  [FAIL-rows] {name}: spark={len(got)} duck={len(exp)}")
        n_fail += 1
        continue
    # value compare: exact string repr after normalizing dtypes
    mism = None
    for c in got.columns:
        a, b = got[c], exp[c]
        sa = a.map(lambda v: repr(v))
        sb = b.map(lambda v: repr(v))
        if not sa.equals(sb):
            bad = (sa != sb)
            i = bad.idxmax()
            mism = (c, i, a[i], b[i])
            break
    if mism:
        c, i, av, bv = mism
        print(f"  [FAIL-val ] {name}: col={c} row={i} "
              f"spark={av!r} duck={bv!r} "
              f"(types {got[c].dtype} vs {exp[c].dtype})")
        n_fail += 1
    else:
        print(f"  [PASS     ] {name}: {len(got)} rows")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
sys.exit(1 if n_fail else 0)
