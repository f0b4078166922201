#!/bin/bash
# Round-18 evidence regeneration chain — runs sequentially on a quiet box
# after the final source commit, per the round protocol. Each step logs to
# /tmp/r18_<step>.log; the script stops at the first failure. pipefail is
# load-bearing (round-14 ADVICE): the correctness guards and bench
# extractions are piped through tail/sed, and without it a nonzero exit
# from check.py / check_cluster.py / grep would be masked by the pipe
# tail's exit 0 and the chain would run to DONE past a failed gate.
set -e
set -o pipefail
cd /root/repo
JAR=/root/repo/target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13

step() { echo "== $(date -u +%H:%M:%S) $1 =="; }

step "verify local"
rm -rf /tmp/v18f
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18f" > /tmp/r18_verify.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/v18f 2>&1 | tail -1

step "package"
sbt -batch package > /tmp/r18_package.log 2>&1

step "cluster verify"
rm -rf /tmp/v18fc
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER='local-cluster[2,16,4096]' SPARK_GRAFT_JARS=$JAR \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18fc" > /tmp/r18_cverify.log 2>&1
python3 tools/check_cluster.py /root/testdata/sf0.01 /tmp/v18fc CORRECTNESS_cluster.json 'local-cluster[2,16,4096]' 2>&1 | tail -1

# Previous-round baseline for the LOCAL series (r15 "What's wrong" 2):
# bench_queries.json is overwritten in place, so export the previous
# ROUND's committed copy (anchored on the driver's last "round N:" commit,
# so a same-round driver re-run still compares against the real previous
# round) as SPARK_GRAFT_BENCH_PREV. The cluster bench keeps its own
# filename-based discovery.
PREV_ROUND_COMMIT=$(git log -1 --format=%H --grep='^round [0-9]\+:' || true)
PREV_ROUND_N=$(git log -1 --format=%s --grep='^round [0-9]\+:' | sed 's/^round \([0-9]*\).*/\1/' || true)
BENCH_PREV_ENV=()
if [ -n "$PREV_ROUND_COMMIT" ] && \
   git show "$PREV_ROUND_COMMIT:bench_queries.json" > "/tmp/bench_queries_r${PREV_ROUND_N}_committed.json" 2>/dev/null; then
  # The previous round's committed detail must have been measured at the
  # SAME master as this run (the r17 commit carried the driver's 8-core
  # scaling detail): fall back to the committed 32-core SIBLING when the
  # official detail's master mismatches. Bench.vsPrev also rejects a
  # mismatched prev on its own — this just picks the best usable anchor.
  PREV_MASTER=$(python3 -c "import json;print(json.load(open('/tmp/bench_queries_r${PREV_ROUND_N}_committed.json')).get('master',''))")
  if [ "$PREV_MASTER" != "local[32]" ] && \
     git show "$PREV_ROUND_COMMIT:bench_queries_sibling.json" > "/tmp/bench_queries_r${PREV_ROUND_N}_committed.json" 2>/dev/null; then
    echo "NOTE: previous official detail was $PREV_MASTER - using the committed 32-core sibling as the vs-prev anchor"
  fi
  BENCH_PREV_ENV=(SPARK_GRAFT_BENCH_PREV="/tmp/bench_queries_r${PREV_ROUND_N}_committed.json")
  echo "local auto-vs-prev baseline: round $PREV_ROUND_N ($PREV_ROUND_COMMIT)"
else
  echo "WARN: no previous-round bench_queries.json found - local detail will carry no auto-vs-prev clause"
fi

# Two-session protocol (r16 verdict top task): the official bench runs
# TWICE in fresh JVMs. Session A writes <detail>_sibling.json; session B
# pairs with it, ships the per-query min, and flags only queries above
# 1.25x vs prev in BOTH sessions.
step "local bench sf0.1 session A (sibling)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_DETAIL=bench_queries_sibling.json \
  sbt -batch "runMain graft.Bench" > /tmp/r18_benchA.log 2>&1
grep '"metric":"total"' /tmp/r18_benchA.log | sed 's/^\[info\] //' | tail -1

step "local bench sf0.1 session B (official, ships min of both sessions)"
env "${BENCH_PREV_ENV[@]}" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r18_bench.log 2>&1
grep '"metric":"total"' /tmp/r18_bench.log | sed 's/^\[info\] //' | tail -1
{ grep -o 'auto-vs-prev([^)]*)[^"]*' bench_queries.json || echo "NOTE: local detail has no auto-vs-prev clause"; } | tail -1

step "cluster bench sf0.01 session A (sibling)"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER='local-cluster[2,16,4096]' SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_cluster_r18_queries_sibling.json \
  sbt -batch "runMain graft.Bench" > /tmp/r18_cbenchA.log 2>&1
grep '"metric":"total"' /tmp/r18_cbenchA.log | sed 's/^\[info\] //' | tail -1

step "cluster bench sf0.01 session B (official)"
# set the note env only when non-empty: an empty exported note still
# appends its "; " separator into the method string
if [ -n "$CLUSTER_NOTE" ]; then export SPARK_GRAFT_BENCH_NOTE="$CLUSTER_NOTE"; else unset SPARK_GRAFT_BENCH_NOTE; fi
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER='local-cluster[2,16,4096]' SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_cluster_r18_queries.json \
  sbt -batch "runMain graft.Bench" > /tmp/r18_cbench.log 2>&1
grep '"metric":"total"' /tmp/r18_cbench.log | sed 's/^\[info\] //' | tail -1 > /tmp/r18_cluster_line.json
python3 - <<'EOF'
import json
obj = json.load(open('/tmp/r18_cluster_line.json'))
json.dump(obj, open('/root/repo/BENCH_cluster_r18.json','w'), indent=1)
open('/root/repo/BENCH_cluster_r18.json','a').write('\n')
print('cluster total', obj['value'], obj['count'], 'flags', obj.get('flags'))
EOF

step "watch-list recurrence report (m10/p13 local - the r17 verdict's two flagged regressions - plus q11/e05/e06 cluster)"
python3 - <<'EOF'
import json, os
local = json.load(open('bench_queries.json'))
cluster = json.load(open('BENCH_cluster_r18_queries.json'))
print('local flags (both-session rule):', local.get('flags'))
print('cluster flags (both-session rule):', cluster.get('flags'))
prev_local_path = [p for p in os.listdir('/tmp') if p.startswith('bench_queries_r') and p.endswith('_committed.json')]
prev_local = json.load(open('/tmp/' + sorted(prev_local_path)[-1])).get('queries', {}) if prev_local_path else {}
for name in ['m10_crossmodal_clusters', 'p13_unimax_budget', 'p16_dup_graph_bfs']:
    v, p = local['queries'].get(name), prev_local.get(name)
    r = round(v / p, 2) if (v and p) else None
    print(f'local watch {name}: shipped {v} prev {p} ratio {r}')
# newest committed cluster detail below this round — r17's was never
# committed (r17 verdict bookkeeping failure #4), so discover like
# Bench.autoPrevDetail does instead of hardcoding r17
import re
cands = sorted((int(m.group(1)), p) for p in os.listdir('.')
               for m in [re.match(r'BENCH_cluster_r(\d+)_queries\.json$', p)]
               if m and int(m.group(1)) < 18)
prev_cluster = json.load(open(cands[-1][1])).get('queries', {}) if cands else {}
print('cluster watch baseline:', cands[-1][1] if cands else 'NONE')
for name in ['q11_important_parts', 'e05_top_users', 'e06_inter_event_gaps']:
    v, p = cluster['queries'].get(name), prev_cluster.get(name)
    r = round(v / p, 2) if (v and p) else None
    print(f'cluster watch {name}: shipped {v} prev {p} ratio {r}')
EOF

step "two-session A/B self-test vs this round's own artifact (done-criterion: zero flags)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/r18_selftest_sibling.json \
  sbt -batch "runMain graft.Bench" > /tmp/r18_selftestA.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/r18_selftest_queries.json \
  SPARK_GRAFT_BENCH_SIBLING=/tmp/r18_selftest_sibling.json \
  SPARK_GRAFT_BENCH_PREV=/root/repo/bench_queries.json \
  sbt -batch "runMain graft.Bench" > /tmp/r18_selftestB.log 2>&1
python3 - <<'EOF'
import json, sys
d = json.load(open('/tmp/r18_selftest_queries.json'))
flags = d.get('flags', None)
print('self-test flags:', flags, ' method-clause:',
      [s for s in d.get('method','').split(';') if 'auto-vs-prev' in s])
if flags is None:
    sys.exit('SELF-TEST BROKEN: no flags field in detail')
if flags:
    sys.exit(f'SELF-TEST FAILED: same-code A/B produced flags {flags}')
print('self-test OK: zero flags')
EOF

step "sf1 checkpoint"
if [ -n "$SF1_NOTE" ]; then export SPARK_GRAFT_BENCH_NOTE="$SF1_NOTE"; else unset SPARK_GRAFT_BENCH_NOTE; fi
SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BenchSf1" > /tmp/r18_sf1.log 2>&1
unset SPARK_GRAFT_BENCH_NOTE
grep -c '"metric":"sf1_checkpoint"' /tmp/r18_sf1.log

step "ivf nlist sweep at sf1 (NPROBE axis widened to 16 since r15 - pins the other half of the dial the s06 gate negotiates)"
SPARK_GRAFT_SF_DIR=/root/repo/.bench-sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NPROBES=1,2,4,8,16 \
  sbt -batch "runMain graft.IvfNlistSweep" > /tmp/r18_nlist.log 2>&1
grep -c '"metric":"ivf_nlist_sweep"' /tmp/r18_nlist.log

step "executor loss drill"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.ExecutorLossDrill" > /tmp/r18_dexec.log 2>&1
tail -c 300 DRILL_executor_loss.json

step "stream state loss drill"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.StreamStateLossDrill" > /tmp/r18_dstream.log 2>&1
tail -c 300 DRILL_stream_state_loss.json

step "ivf fold loss drill"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.IvfFoldLossDrill" > /tmp/r18_divf.log 2>&1
tail -c 300 DRILL_ivf_fold_loss.json

step "driver loss drill (file)"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.DriverLossDrill" > /tmp/r18_ddrv.log 2>&1
tail -c 400 DRILL_driver_loss.json

step "driver loss drill (objsim, ivf included since r15)"
SPARK_GRAFT_JARS=$JAR SPARK_GRAFT_DRILL_FS=objsim \
  sbt -batch "runMain graft.DriverLossDrill" > /tmp/r18_ddrvo.log 2>&1
tail -c 500 DRILL_driver_loss_objsim.json

step "driver loss drill (fileobj - object committer forced onto posix roots: drills the scheme-matched tmp+exclusive-rename commit publish under SIGKILL)"
SPARK_GRAFT_JARS=$JAR SPARK_GRAFT_DRILL_FS=fileobj \
  sbt -batch "runMain graft.DriverLossDrill" > /tmp/r18_ddrvf.log 2>&1
tail -c 500 DRILL_driver_loss_fileobj.json

# aux benches: anchor each vs_prev clause on the previous ROUND's committed
# artifact (same PREV_ROUND_COMMIT as the local bench), so a same-round
# driver re-run still compares against the real previous round; without the
# export the Scala mains fall back to the on-disk file they overwrite.
# Consumed via an env ARRAY (r16 ADVICE: unquoted $(aux_prev ...)
# word-splitting breaks on paths with spaces), same pattern as
# BENCH_PREV_ENV above.
aux_prev_env() { # $1 = artifact name; sets AUX_PREV_ENV array
  AUX_PREV_ENV=()
  if [ -n "$PREV_ROUND_COMMIT" ] && \
     git show "$PREV_ROUND_COMMIT:$1" > "/tmp/prev_$1" 2>/dev/null; then
    AUX_PREV_ENV=(SPARK_GRAFT_AUX_PREV="/tmp/prev_$1")
  fi
}

step "cdc bench"
aux_prev_env BENCH_cdc.json
env "${AUX_PREV_ENV[@]}" sbt -batch "runMain graft.CdcBench" > /tmp/r18_cdc.log 2>&1
grep '"metric":"cdc_throughput"' /tmp/r18_cdc.log | sed 's/^\[info\] //' | tail -1 | python3 -m json.tool > /dev/null
grep '"metric":"cdc_throughput"' /tmp/r18_cdc.log | sed 's/^\[info\] //' | tail -1 > BENCH_cdc.json
grep -o '"vs_prev":"[^"]*"' BENCH_cdc.json || true

step "ingest bench"
aux_prev_env BENCH_ingest.json
env "${AUX_PREV_ENV[@]}" sbt -batch "runMain graft.IngestBench" > /tmp/r18_ingest.log 2>&1
grep -o '"vs_prev":"[^"]*"' BENCH_ingest.json || true
tail -c 200 BENCH_ingest.json

step "media bench"
aux_prev_env BENCH_media.json
env "${AUX_PREV_ENV[@]}" sbt -batch "runMain graft.MediaIngestBench" > /tmp/r18_media.log 2>&1
grep -o '"vs_prev":"[^"]*"' BENCH_media.json || true
tail -c 200 BENCH_media.json

step "guards"
python3 tools/check_bench.py BENCH_cluster_r18.json /tmp/v18f BENCH_cluster_r18_queries.json
python3 tools/check_bench.py BENCH_cluster_r18.json /tmp/v18f bench_queries.json

step "DONE"
