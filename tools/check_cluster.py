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
# last SOURCE commit — anchored on src/ + build.sbt, not HEAD (round-12
# finding: doc/evidence-only commits after the Verify run would otherwise
# refuse an artifact produced at the final source state).
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
def git(*args):
    return subprocess.run(['git', '-C', repo] + list(args),
                          capture_output=True, text=True).stdout.strip()
head = git('rev-parse', 'HEAD')
src_head = git('log', '-1', '--format=%H', '--', 'src/', 'build.sbt')
src_ct = int(git('log', '-1', '--format=%ct', '--', 'src/', 'build.sbt') or 0)
if not head or not src_head or src_ct == 0:
    # fail CLOSED: without the source anchor the guard cannot certify
    # freshness, and a silent pass here is exactly the stale-artifact
    # regression it exists to stop
    sys.exit(f'REFUSED: cannot determine last source commit of {repo} — the '
             'staleness guard needs a readable repository to certify the artifact')
if not os.path.isfile(f'{outdir}/oracle_sql.json'):
    sys.exit(f'REFUSED: {outdir}/oracle_sql.json missing — run graft.Verify first')
dump_mt = os.path.getmtime(f'{outdir}/oracle_sql.json')
if dump_mt < src_ct:
    sys.exit(f'REFUSED: verify dump at {outdir} ({time.ctime(dump_mt)}) predates '
             f'the last source commit {src_head[:9]} ({time.ctime(src_ct)}) — '
             'rerun graft.Verify at the current source state')

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

out = {'_meta': {'mode': mode, 'sf': sfdir, 'head': head, 'src_head': src_head,
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
