#!/usr/bin/env python3
"""Staleness + coverage guard for the CLUSTER BENCH artifact (round-11
finding: BENCH_cluster_r11.json shipped one query short and one commit
stale — the correctness dump had a guard, the bench artifact did not).

Usage: check_bench.py BENCH_cluster_rN.json <verify_dump_dir> [detail_json]

The headline artifact carries only the 8 spotlight queries; the full
per-query map lives in the detail file (graft.Bench's
SPARK_GRAFT_BENCH_DETAIL / bench_queries_<sf>.json) — pass it as the
third arg for the per-name coverage check.

Refuses (exit != 0) when:
  - the artifact (or the detail file) predates HEAD's commit time, or
  - the artifact's query COUNT differs from the declared oracle suite
    (the verify dump's oracle_sql.json at HEAD), or the detail file's
    query NAMES miss any declared query, or
  - the artifact records failed queries.
"""
import json, os, subprocess, sys, time

bench_path, dump_dir = sys.argv[1], sys.argv[2]
detail_path = sys.argv[3] if len(sys.argv) > 3 else None

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
if bench.get('count') != len(declared):
    sys.exit(f'REFUSED: bench artifact counts {bench.get("count")} queries, '
             f'declared suite has {len(declared)} — stale scope')
if bench.get('failed'):
    sys.exit(f'REFUSED: bench artifact records failures: {bench["failed"]}')
if detail_path:
    if os.path.getmtime(detail_path) < head_ct:
        sys.exit(f'REFUSED: detail file {detail_path} predates HEAD')
    benched = set(json.load(open(detail_path)).get('queries', {}))
    missing = declared - benched
    if missing:
        sys.exit(f'REFUSED: detail file is missing {len(missing)} declared '
                 f'queries: {sorted(missing)[:10]}')
print(f'OK: {bench_path} fresh at HEAD {head[:9]}, {bench["count"]} queries '
      '(= declared suite' + (', per-name verified' if detail_path else '') + ')')
