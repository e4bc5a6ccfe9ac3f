# d7 x30 oracle, decomposed: the full d7 oracle = (d2 pair pipeline) + label
# closure. The d2 pipeline's output parquet is already hash-verified against
# DuckDB at x30 (d2_minhash_lsh: 2393121 rows, f702269fbacac591), so running
# the closure over THAT verified relation is equivalent to the monolithic
# oracle, without re-paying the 90GB+ shingle-explosion spill.
import sys, json, hashlib, glob, os
import duckdb
con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('DUCK_MEM','110GB')}'")
con.sql("SET temp_directory='/tmp/duck_spill'")
v = "/tmp/scale_probe/v30x"
sql = f"""
WITH RECURSIVE pairs AS (SELECT da, db FROM '{v}/d2_minhash_lsh/*.parquet'),
edges AS (SELECT da AS src, db AS dst FROM pairs
          UNION SELECT db, da FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
lab AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src)
SELECT label AS cluster_id, COUNT(*) AS n_docs,
       MAX(doc_id) AS max_doc_id,
       COUNT(*) - 1 AS n_removed
FROM lab GROUP BY label ORDER BY cluster_id
"""
du = con.sql(sql)
du_cols, du_rows = du.columns, du.fetchall()
sp = con.sql(f"SELECT * FROM '{v}/d7_dup_clusters/*.parquet'")
sp_cols, sp_rows = sp.columns, sp.fetchall()

def canon(x):
    if isinstance(x, float): return repr(x)
    return str(x)
def rows_of(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)
assert sorted(sp_cols) == sorted(du_cols), (sp_cols, du_cols)
a, b = rows_of(sp_rows, sp_cols), rows_of(du_rows, du_cols)
ha = hashlib.sha256(json.dumps(a).encode()).hexdigest()[:16]
hb = hashlib.sha256(json.dumps(b).encode()).hexdigest()[:16]
if a == b:
    print(f"OK   d7_dup_clusters(closure-over-verified-pairs): rows={len(a)} hash={ha}")
else:
    print(f"FAIL d7: rows spark={len(a)} duck={len(b)} {ha}!={hb}")
    print("spark-only:", [r for r in a if r not in b][:3])
    print("duck-only: ", [r for r in b if r not in a][:3])
    sys.exit(1)
