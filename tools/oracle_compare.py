#!/usr/bin/env python3
"""Compare graft.Verify output against the DuckDB oracle (driver-gate twin).
Usage: oracle_compare.py <verifyDir> <sfDir> [q1,q2,...]"""
import json, duckdb, hashlib, sys
vd, sf = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
sql = json.load(open(f'{vd}/oracle_sql.json'))
con = duckdb.connect(); con2 = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
bad = []
for name, q in sql.items():
    if only and name not in only: continue
    try:
        o = con.sql(q).df()
        s = con2.sql(f"SELECT * FROM read_parquet('{vd}/{name}/*.parquet')").df()
        o = o.reindex(sorted(o.columns), axis=1); s = s.reindex(sorted(s.columns), axis=1)
        if list(o.columns) != list(s.columns):
            bad.append((name, f'cols {list(s.columns)} vs {list(o.columns)}')); continue
        if len(o) != len(s): bad.append((name, f'rows {len(s)} vs {len(o)}')); continue
        o = o.sort_values(list(o.columns)).reset_index(drop=True)
        s = s.sort_values(list(s.columns)).reset_index(drop=True)
        ho = hashlib.md5(o.to_csv(index=False, float_format='%.10g').encode()).hexdigest()
        hs = hashlib.md5(s.to_csv(index=False, float_format='%.10g').encode()).hexdigest()
        if ho != hs: bad.append((name, 'hash'))
    except Exception as e: bad.append((name, str(e)[:160]))
n = len(only) if only else len(sql)
print('checked', n, 'mismatches:', bad if bad else 'NONE')
sys.exit(1 if bad else 0)
