#!/usr/bin/env python3
"""Bit-identity compare of two graft.Verify output dirs (e.g. runs at
different SPARK_GRAFT_CPUS / shuffle-partition counts): every query's
parquet must hold the exact same multiset of rows. Doubles are compared
by exact value — the engine's determinism recipe promises bit-identical
results under any partitioning, so no tolerance is applied.

Usage: compare_runs.py <dirA> <dirB> [name-regex]
"""
import glob, os, re, sys
import duckdb

a, b = sys.argv[1], sys.argv[2]
only = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
con = duckdb.connect()
names = sorted(d for d in os.listdir(a)
               if os.path.isdir(os.path.join(a, d)) and glob.glob(f"{a}/{d}/*.parquet"))
fails = 0
for name in names:
    if only and not only.search(name):
        continue
    if not glob.glob(f"{b}/{name}/*.parquet"):
        print(f"FAIL {name}: missing in {b}"); fails += 1; continue
    na = con.sql(f"SELECT count(*) FROM '{a}/{name}/*.parquet'").fetchone()[0]
    nb = con.sql(f"SELECT count(*) FROM '{b}/{name}/*.parquet'").fetchone()[0]
    if na != nb:
        print(f"FAIL {name}: rows {na} vs {nb}"); fails += 1; continue
    # symmetric multiset difference via per-row counts
    diff = con.sql(f"""
        WITH ca AS (SELECT *, count(*) AS __n FROM '{a}/{name}/*.parquet' GROUP BY ALL),
             cb AS (SELECT *, count(*) AS __n FROM '{b}/{name}/*.parquet' GROUP BY ALL)
        SELECT count(*) FROM ((SELECT * FROM ca EXCEPT SELECT * FROM cb)
                        UNION ALL (SELECT * FROM cb EXCEPT SELECT * FROM ca))""").fetchone()[0]
    if diff:
        print(f"FAIL {name}: {diff} differing row groups"); fails += 1
    else:
        print(f"OK   {name}: rows={na}")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
