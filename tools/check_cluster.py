#!/usr/bin/env python3
"""Correctness gate in the driver's JSON shape, for the multi-executor
(local-cluster) evidence artifact: same DuckDB compare as check.py
(columns sorted by name, rows sorted, exact values), but emits one
CORRECTNESS-style JSON object per query plus a _meta record describing
the execution mode, so `CORRECTNESS_cluster.json` reads like the
driver's own gate output."""
import duckdb, sys, glob, json, math, os, subprocess, time
import pandas as pd
import pyarrow.parquet as pq

sfdir, outdir, outjson, mode = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

# Staleness guard (round-10 finding: a cluster artifact one commit older
# than HEAD shipped): refuse to bless a Verify dump produced BEFORE the
# newest source commit — regenerate the dump at HEAD instead.
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
def git(*args):
    return subprocess.run(['git', '-C', repo] + list(args),
                          capture_output=True, text=True).stdout.strip()
head = git('rev-parse', 'HEAD')
head_ct = int(git('log', '-1', '--format=%ct') or 0)
if not head or head_ct == 0:
    # fail CLOSED: without HEAD the guard cannot certify freshness, and a
    # silent pass here is exactly the stale-artifact regression it exists
    # to stop
    sys.exit(f'REFUSED: cannot determine git HEAD of {repo} — the staleness '
             'guard needs a readable repository to certify the artifact')
if not os.path.isfile(f'{outdir}/oracle_sql.json'):
    sys.exit(f'REFUSED: {outdir}/oracle_sql.json missing — run graft.Verify first')
dump_mt = os.path.getmtime(f'{outdir}/oracle_sql.json')
if dump_mt < head_ct:
    sys.exit(f'REFUSED: verify dump at {outdir} ({time.ctime(dump_mt)}) predates '
             f'HEAD {head[:9]} ({time.ctime(head_ct)}) — rerun graft.Verify at HEAD '
             'before shipping a cluster artifact')

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

out = {'_meta': {'mode': mode, 'sf': sfdir, 'head': head,
                 'generated_at': time.strftime('%Y-%m-%dT%H:%M:%S%z')}}
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
