#!/usr/bin/env python3
"""Staleness + coverage guard for the CLUSTER BENCH artifact (round-11
finding: BENCH_cluster_r11.json shipped one query short and one commit
stale — the correctness dump had a guard, the bench artifact did not).

Usage: check_bench.py BENCH_cluster_rN.json <verify_dump_dir> [detail_json]

The headline artifact carries only the 8 spotlight queries; the full
per-query map lives in the detail file (graft.Bench's
SPARK_GRAFT_BENCH_DETAIL / bench_queries_<sf>.json) — pass it as the
third arg for the per-name coverage check.

Freshness is anchored on the LAST COMMIT TOUCHING src/ + build.sbt, not
HEAD (round-12 finding: README/evidence-only commits after the bench run
made the guard refuse an artifact that was in fact produced at the final
source state). Provenance is checked by the SHA the bench recorded
inside the artifact ("head", written by graft.Bench) when present — the
artifact is fresh iff that sha has the last source commit as an
ancestor-or-equal; file mtimes are only the fallback for sha-less
artifacts, because a fresh clone resets mtimes to checkout time and an
mtime guard then passes trivially off the producing machine.

Refuses (exit != 0) when:
  - the artifact (or the detail file) was produced before the last
    source commit (by recorded sha, else by mtime), or
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
                          capture_output=True, text=True)
def git_out(*args):
    return git(*args).stdout.strip()

src_head = git_out('log', '-1', '--format=%H', '--', 'src/', 'build.sbt')
src_ct = int(git_out('log', '-1', '--format=%ct', '--', 'src/', 'build.sbt') or 0)
if not src_head or src_ct == 0:
    # fail CLOSED: without the source anchor the guard cannot certify
    # freshness
    sys.exit(f'REFUSED: cannot determine last source commit of {repo}')

def check_fresh(path, obj=None):
    """Artifact freshness vs the last source commit: recorded sha when the
    artifact carries one, mtime fallback otherwise."""
    rec = (obj or {}).get('head')
    if rec and rec != 'unknown':
        if git('cat-file', '-e', f'{rec}^{{commit}}').returncode != 0:
            sys.exit(f'REFUSED: {path} records unknown commit {rec[:9]}')
        if git('merge-base', '--is-ancestor', src_head, rec).returncode != 0:
            sys.exit(f'REFUSED: {path} was produced at {rec[:9]}, which '
                     f'predates the last source commit {src_head[:9]} — '
                     'rerun it at (or after) the current source state')
        return f'sha {rec[:9]}'
    mt = os.path.getmtime(path)
    if mt < src_ct:
        sys.exit(f'REFUSED: {path} ({time.ctime(mt)}) predates the last '
                 f'source commit {src_head[:9]} ({time.ctime(src_ct)}) — '
                 'rerun it at the current source state')
    return 'mtime'

bench = json.load(open(bench_path))
if 'count' not in bench and isinstance(bench.get('tail'), str):
    # the driver's LOCAL bench artifact (BENCH_rN.json) is a raw sbt-tail
    # wrapper whose "parsed" stays null because the embedded JSON line
    # carries sbt's "[info] " prefix — recover it from the tail so the
    # same guard covers the local artifact (round-13 "What's wrong" 1)
    parsed = bench.get('parsed')
    if not isinstance(parsed, dict) or parsed.get('metric') != 'total':
        # recover specifically the TOTAL line (a tail may carry other
        # metric lines after it, and a malformed candidate must not be
        # silently swallowed in favor of a later wrong object): take the
        # last line that parses AND declares metric == total
        parsed = None
        for line in bench['tail'].splitlines():
            line = line.strip()
            if line.startswith('[info] '):
                line = line[len('[info] '):]
            if line.startswith('{"metric":"total"'):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if cand.get('metric') == 'total':
                    parsed = cand
    if not isinstance(parsed, dict):
        sys.exit(f'REFUSED: {bench_path} has no parsed bench JSON and no '
                 'metric=total line recoverable from its tail')
    bench = parsed
how = check_fresh(bench_path, bench)

oracle_file = f'{dump_dir}/oracle_sql.json'
if not os.path.isfile(oracle_file):
    sys.exit(f'REFUSED: {oracle_file} missing — run graft.Verify first')
check_fresh(oracle_file)

declared = set(json.load(open(oracle_file)))
if bench.get('count') != len(declared):
    sys.exit(f'REFUSED: bench artifact counts {bench.get("count")} queries, '
             f'declared suite has {len(declared)} — stale scope')
if bench.get('failed'):
    sys.exit(f'REFUSED: bench artifact records failures: {bench["failed"]}')
if detail_path:
    detail = json.load(open(detail_path))
    check_fresh(detail_path, detail)
    benched = set(detail.get('queries', {}))
    missing = declared - benched
    if missing:
        sys.exit(f'REFUSED: detail file is missing {len(missing)} declared '
                 f'queries: {sorted(missing)[:10]}')
print(f'OK: {bench_path} fresh vs source commit {src_head[:9]} (via {how}), '
      f'{bench["count"]} queries (= declared suite'
      + (', per-name verified' if detail_path else '') + ')')
