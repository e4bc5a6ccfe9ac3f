#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <outDir> <sfDir>
Reads each <outDir>/<name>/ parquet (Spark output) and runs
<outDir>/oracle_sql.json[name] in DuckDB against views over <sfDir>'s
tables; compares row counts, sorted-row value hashes, and prints a diff
sample on mismatch.
"""
import os, re, sys, json, glob, hashlib
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
only = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
con = duckdb.connect()
# cap DuckDB and spill to disk instead of OOMing the machine on the
# heavy UNNEST-based oracles at large synthetic SFs
con.sql(f"SET memory_limit='{os.environ.get('DUCK_MEM', '48GB')}'")
con.sql("SET temp_directory='/tmp/duck_spill'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # driver SFs are single files; graft.ScaleGen probes are
    # <table>.parquet/ directories of part files — glob the latter
    tpath = f"{sfdir}/{t}.parquet"
    if os.path.isdir(tpath):
        tpath = f"{tpath}/*.parquet"
    elif not os.path.exists(tpath):
        # table-subset probe corpus (graft.ScaleGen tablesRe): skip the
        # view; any oracle touching it fails loudly at query time
        continue
    if t == "events":
        # driver SFs carry ts as timestamp[ns]; Spark-rewritten scale
        # probes (graft.ScaleGen) carry the same nanos as BIGINT —
        # normalize so every oracle sees one ts type
        tstype = con.sql(f"SELECT typeof(ts) FROM '{tpath}' LIMIT 1").fetchone()[0]
        if tstype == "BIGINT":
            # micros is the precision every consumer uses (Spark reads
            # the ns column via `ts div 1000`), so a micros TIMESTAMP
            # view is exactly equivalent for the oracles
            con.sql(f"CREATE VIEW events AS SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM '{tpath}'")
            continue
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tpath}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def rows_of(df_rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in df_rows]
    return sorted(rows)

fails = 0
for name in sorted(oracle):
    if only and not only.search(name):
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    sp = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    sp_cols, sp_rows = sp.columns, sp.fetchall()
    try:
        du = con.sql(oracle[name])
        du_cols, du_rows = du.columns, du.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if sorted(sp_cols) != sorted(du_cols):
        print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}"); fails += 1; continue
    a, b = rows_of(sp_rows, sp_cols), rows_of(du_rows, du_cols)
    ha = hashlib.sha256(json.dumps(a).encode()).hexdigest()[:16]
    hb = hashlib.sha256(json.dumps(b).encode()).hexdigest()[:16]
    if a == b:
        print(f"OK   {name}: rows={len(a)} hash={ha}")
    else:
        fails += 1
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)} hash {ha}!={hb}")
        onlya = [r for r in a if r not in b][:3]
        onlyb = [r for r in b if r not in a][:3]
        print(f"  spark-only: {onlya}\n  duck-only:  {onlyb}")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
