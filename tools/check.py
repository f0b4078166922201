#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Verify parquet output
(columns sorted by name, rows sorted, exact values)."""
import duckdb, sys, glob, json, math
import pandas as pd
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell(v):
    if isinstance(v, float):
        return v.hex() if not math.isnan(v) else 'nan'
    return str(v)

npass = nfail = 0
for name in sorted(oracle):
    if only and name not in only: continue
    sql = oracle[name]
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f'FAIL {name}: ORACLE ERROR: {str(e)[:300]}'); nfail += 1; continue
    try:
        files = glob.glob(f'{outdir}/{name}/*.parquet')
        got = pq.read_table(files).to_pandas()
    except Exception as e:
        print(f'FAIL {name}: SPARK OUTPUT MISSING: {str(e)[:200]}'); nfail += 1; continue
    e_c, g_c = canon(exp), canon(got)
    if list(e_c.columns) != list(g_c.columns):
        print(f'FAIL {name}: COLUMNS exp={list(e_c.columns)} got={list(g_c.columns)}'); nfail += 1; continue
    if len(e_c) != len(g_c):
        print(f'FAIL {name}: ROWS exp={len(e_c)} got={len(g_c)}'); nfail += 1; continue
    mism = None
    for c in e_c.columns:
        ev, gv = e_c[c].tolist(), g_c[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if cell(a) != cell(b):
                mism = (c, i, a, b); break
        if mism: break
    if mism:
        c, i, a, b = mism
        print(f'FAIL {name}: VALUE col={c} row={i} exp={a!r} got={b!r}')
        print(f'     dtypes exp={e_c[c].dtype} got={g_c[c].dtype}')
        nfail += 1
    else:
        npass += 1
        print(f'PASS {name} ({len(e_c)} rows)')
print(f'== {npass} pass / {nfail} fail ==')
