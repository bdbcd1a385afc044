#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle, compare schema-insensitively (columns sorted by name, rows
sorted, exact value equality)."""
import sys, json, glob, math
import duckdb, pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f'{sfdir}/*.parquet'):
    name = f.split('/')[-1].replace('.parquet','')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'NaN'
        return v
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_tbl = pq.read_table(glob.glob(f'{outdir}/{name}/*.parquet')[0])
        cols = sorted(spark_tbl.column_names)
        srows = [tuple(norm(spark_tbl.column(c)[i].as_py()) for c in cols)
                 for i in range(spark_tbl.num_rows)]
        d = con.execute(sql).fetch_arrow_table()
        dcols = sorted(d.column_names)
        drows = [tuple(norm(d.column(c)[i].as_py()) for c in cols)
                 for i in range(d.num_rows)]
        if dcols != cols:
            print(f'FAIL {name}: cols spark={cols} duck={dcols}'); fails+=1; continue
        if len(srows) != len(drows):
            print(f'FAIL {name}: rows spark={len(srows)} duck={len(drows)}'); fails+=1; continue
        srows_s, drows_s = sorted(srows, key=str), sorted(drows, key=str)
        if srows_s != drows_s:
            bad = [(a,b) for a,b in zip(srows_s,drows_s) if a!=b][:3]
            print(f'FAIL {name}: values differ, e.g. {bad}'); fails+=1; continue
        print(f'OK   {name} ({len(srows)} rows)')
    except Exception as e:
        print(f'ERR  {name}: {str(e)[:200]}'); fails += 1
# rows-only queries (no oracle)
import os
for d in sorted(glob.glob(f'{outdir}/q_*')):
    name = os.path.basename(d)
    if name not in oracle:
        try:
            tb = pq.read_table(glob.glob(f'{d}/*.parquet')[0])
            print(f'ROWS {name}: {tb.num_rows} rows, {tb.to_pylist()[:2]}')
        except Exception as e:
            print(f'ERR  {name}: {str(e)[:120]}')
sys.exit(1 if fails else 0)
