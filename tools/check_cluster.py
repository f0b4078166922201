#!/usr/bin/env python3
"""Correctness gate in the driver's JSON shape, for the multi-executor
(local-cluster) evidence artifact: same DuckDB compare as check.py
(columns sorted by name, rows sorted, exact values), but emits one
CORRECTNESS-style JSON object per query plus a _meta record describing
the execution mode, so `CORRECTNESS_cluster.json` reads like the
driver's own gate output."""
import duckdb, sys, glob, json, math
import pandas as pd
import pyarrow.parquet as pq

sfdir, outdir, outjson, mode = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def cell(v):
    if isinstance(v, float):
        return v.hex() if not math.isnan(v) else 'nan'
    return str(v)

out = {'_meta': {'mode': mode, 'sf': sfdir}}
npass = nfail = 0
for name in sorted(oracle):
    rec = {'rows_match': False, 'schema_match': False, 'hash_match': False,
           'spark_rows': None, 'oracle_rows': None, 'err': None}
    try:
        exp = canon(con.sql(oracle[name]).df())
        rec['oracle_rows'] = len(exp)
        got = canon(pq.read_table(glob.glob(f'{outdir}/{name}/*.parquet')).to_pandas())
        rec['spark_rows'] = len(got)
        rec['rows_match'] = len(exp) == len(got)
        rec['schema_match'] = list(exp.columns) == list(got.columns)
        if rec['rows_match'] and rec['schema_match']:
            rec['hash_match'] = all(
                cell(a) == cell(b)
                for c in exp.columns
                for a, b in zip(exp[c].tolist(), got[c].tolist()))
    except Exception as e:
        rec['err'] = str(e)[:300]
    out[name] = rec
    ok = rec['rows_match'] and rec['schema_match'] and rec['hash_match']
    npass += ok; nfail += not ok
    print(('PASS' if ok else 'FAIL'), name)
json.dump(out, open(outjson, 'w'), indent=1)
print(f'== {npass} pass / {nfail} fail -> {outjson} ==')
