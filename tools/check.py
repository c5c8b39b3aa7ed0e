#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare graft.Verify output
parquet against DuckDB running SparkEntry.oracleSql over the same testdata.

Usage: python3 tools/check.py [sfdir] [verify_outdir]
"""
import duckdb, glob, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
all_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}

npass = nfail = 0
for name in sorted(all_dirs):
    spark_glob = f"{out}/{name}/*.parquet"
    try:
        got = con.sql(f"SELECT * FROM '{spark_glob}'").df()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        nfail += 1
        continue
    if name not in oracle:
        print(f"ROWS {name}: no oracle, rows={len(got)} " +
              ("OK" if len(got) > 0 else "EMPTY!"))
        npass += 1 if len(got) > 0 else 0
        nfail += 0 if len(got) > 0 else 1
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        nfail += 1
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
        nfail += 1
        continue
    got, exp = got[gc], exp[ec]
    if len(got) != len(exp):
        print(f"FAIL {name}: rowcount spark={len(got)} oracle={len(exp)}")
        nfail += 1
        continue
    g = got.sort_values(gc, kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(ec, kind="mergesort").reset_index(drop=True)
    g = g.astype(str)
    e = e.astype(str)
    neq = (g != e)
    if neq.any().any():
        bad = neq.any(axis=1)
        i = bad[bad].index[0]
        print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first at {i}:")
        print("  spark :", g.iloc[i].to_dict())
        print("  oracle:", e.iloc[i].to_dict())
        nfail += 1
    else:
        print(f"PASS {name}: {len(g)} rows")
        npass += 1

missing = set(oracle) - all_dirs
for name in sorted(missing):
    print(f"FAIL {name}: oracle declared but no spark output")
    nfail += 1
print(f"== {npass} pass, {nfail} fail ==")
sys.exit(1 if nfail else 0)
