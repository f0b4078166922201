#!/usr/bin/env python3
"""Staleness + coverage guard for the CLUSTER BENCH artifact (round-11
finding: BENCH_cluster_r11.json shipped one query short and one commit
stale — the correctness dump had a guard, the bench artifact did not).

Usage: check_bench.py BENCH_cluster_rN.json <verify_dump_dir>

Refuses (exit != 0) when:
  - the artifact predates HEAD's commit time (stale vs source), or
  - the artifact's query set differs from the declared oracle suite
    (the verify dump's oracle_sql.json at HEAD), or
  - the artifact records failed queries.
"""
import json, os, subprocess, sys, time

bench_path, dump_dir = sys.argv[1], sys.argv[2]

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
def git(*args):
    return subprocess.run(['git', '-C', repo] + list(args),
                          capture_output=True, text=True).stdout.strip()
head = git('rev-parse', 'HEAD')
head_ct = int(git('log', '-1', '--format=%ct') or 0)
if not head or head_ct == 0:
    # fail CLOSED, mirroring check_cluster.py: without HEAD the guard
    # cannot certify freshness
    sys.exit(f'REFUSED: cannot determine git HEAD of {repo}')

bench_mt = os.path.getmtime(bench_path)
if bench_mt < head_ct:
    sys.exit(f'REFUSED: {bench_path} ({time.ctime(bench_mt)}) predates HEAD '
             f'{head[:9]} ({time.ctime(head_ct)}) — rerun graft.Bench at HEAD')

oracle_file = f'{dump_dir}/oracle_sql.json'
if not os.path.isfile(oracle_file):
    sys.exit(f'REFUSED: {oracle_file} missing — run graft.Verify first')
if os.path.getmtime(oracle_file) < head_ct:
    sys.exit(f'REFUSED: {oracle_file} predates HEAD — rerun graft.Verify')

declared = set(json.load(open(oracle_file)))
bench = json.load(open(bench_path))
benched = set(bench.get('queries', {}))
missing, extra = declared - benched, benched - declared
if missing:
    sys.exit(f'REFUSED: bench artifact is missing {len(missing)} declared '
             f'queries: {sorted(missing)[:10]}')
if bench.get('failed'):
    sys.exit(f'REFUSED: bench artifact records failures: {bench["failed"]}')
print(f'OK: {bench_path} fresh at HEAD {head[:9]}, '
      f'{len(benched)} queries (= declared suite'
      + (f' + {len(extra)} extra non-oracle queries' if extra else '') + ')')
