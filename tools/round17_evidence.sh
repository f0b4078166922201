#!/bin/bash
# Round-17 evidence regeneration chain — runs sequentially on a quiet box
# after the final source commit, per the round protocol. Each step logs to
# /tmp/r17_<step>.log; the script stops at the first failure. pipefail is
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
rm -rf /tmp/v17f
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v17f" > /tmp/r17_verify.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/v17f 2>&1 | tail -1

step "package"
sbt -batch package > /tmp/r17_package.log 2>&1

step "cluster verify"
rm -rf /tmp/v17fc
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER='local-cluster[2,16,4096]' SPARK_GRAFT_JARS=$JAR \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v17fc" > /tmp/r17_cverify.log 2>&1
python3 tools/check_cluster.py /root/testdata/sf0.01 /tmp/v17fc CORRECTNESS_cluster.json 'local-cluster[2,16,4096]' 2>&1 | tail -1

step "local bench sf0.1"
# r15 "What's wrong" 2: the LOCAL detail (bench_queries.json, overwritten
# in place) never got the machine-derived auto-vs-prev clause because it
# has no round-stamped siblings to discover. Export the previous ROUND's
# committed copy (anchored on the driver's last "round N:" commit, so a
# same-round driver re-run still compares against the real previous round,
# not this round's own output) as SPARK_GRAFT_BENCH_PREV for THIS step
# only — the cluster bench below must keep its own filename-based
# discovery.
PREV_ROUND_COMMIT=$(git log -1 --format=%H --grep='^round [0-9]\+:' || true)
PREV_ROUND_N=$(git log -1 --format=%s --grep='^round [0-9]\+:' | sed 's/^round \([0-9]*\).*/\1/' || true)
BENCH_PREV_ENV=()
if [ -n "$PREV_ROUND_COMMIT" ] && \
   git show "$PREV_ROUND_COMMIT:bench_queries.json" > "/tmp/bench_queries_r${PREV_ROUND_N}_committed.json" 2>/dev/null; then
  BENCH_PREV_ENV=(SPARK_GRAFT_BENCH_PREV="/tmp/bench_queries_r${PREV_ROUND_N}_committed.json")
  echo "local auto-vs-prev baseline: round $PREV_ROUND_N ($PREV_ROUND_COMMIT)"
else
  echo "WARN: no previous-round bench_queries.json found - local detail will carry no auto-vs-prev clause"
fi
env "${BENCH_PREV_ENV[@]}" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r17_bench.log 2>&1
grep '"metric":"total"' /tmp/r17_bench.log | sed 's/^\[info\] //' | tail -1
{ grep -o 'auto-vs-prev([^)]*)[^"]*' bench_queries.json || echo "NOTE: local detail has no auto-vs-prev clause"; } | tail -1

step "cluster bench sf0.01"
# set the note env only when non-empty: an empty exported note still
# appends its "; " separator into the method string
if [ -n "$CLUSTER_NOTE" ]; then export SPARK_GRAFT_BENCH_NOTE="$CLUSTER_NOTE"; else unset SPARK_GRAFT_BENCH_NOTE; fi
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER='local-cluster[2,16,4096]' SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_cluster_r17_queries.json \
  sbt -batch "runMain graft.Bench" > /tmp/r17_cbench.log 2>&1
grep '"metric":"total"' /tmp/r17_cbench.log | sed 's/^\[info\] //' | tail -1 > /tmp/r17_cluster_line.json
python3 - <<'EOF'
import json
obj = json.load(open('/tmp/r17_cluster_line.json'))
json.dump(obj, open('/root/repo/BENCH_cluster_r17.json','w'), indent=1)
open('/root/repo/BENCH_cluster_r17.json','a').write('\n')
print('cluster total', obj['value'], obj['count'])
EOF

step "sf1 checkpoint"
if [ -n "$SF1_NOTE" ]; then export SPARK_GRAFT_BENCH_NOTE="$SF1_NOTE"; else unset SPARK_GRAFT_BENCH_NOTE; fi
SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BenchSf1" > /tmp/r17_sf1.log 2>&1
unset SPARK_GRAFT_BENCH_NOTE
grep -c '"metric":"sf1_checkpoint"' /tmp/r17_sf1.log

step "ivf nlist sweep at sf1 (NPROBE axis widened to 16 since r15 - pins the other half of the dial the s06 gate negotiates)"
SPARK_GRAFT_SF_DIR=/root/repo/.bench-sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NPROBES=1,2,4,8,16 \
  sbt -batch "runMain graft.IvfNlistSweep" > /tmp/r17_nlist.log 2>&1
grep -c '"metric":"ivf_nlist_sweep"' /tmp/r17_nlist.log

step "executor loss drill"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.ExecutorLossDrill" > /tmp/r17_dexec.log 2>&1
tail -c 300 DRILL_executor_loss.json

step "stream state loss drill"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.StreamStateLossDrill" > /tmp/r17_dstream.log 2>&1
tail -c 300 DRILL_stream_state_loss.json

step "ivf fold loss drill"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.IvfFoldLossDrill" > /tmp/r17_divf.log 2>&1
tail -c 300 DRILL_ivf_fold_loss.json

step "driver loss drill (file)"
SPARK_GRAFT_JARS=$JAR sbt -batch "runMain graft.DriverLossDrill" > /tmp/r17_ddrv.log 2>&1
tail -c 400 DRILL_driver_loss.json

step "driver loss drill (objsim, ivf included since r15)"
SPARK_GRAFT_JARS=$JAR SPARK_GRAFT_DRILL_FS=objsim \
  sbt -batch "runMain graft.DriverLossDrill" > /tmp/r17_ddrvo.log 2>&1
tail -c 500 DRILL_driver_loss_objsim.json

step "driver loss drill (fileobj - object committer forced onto posix roots, : drills the scheme-matched tmp+exclusive-rename commit publish under SIGKILL)"
SPARK_GRAFT_JARS=$JAR SPARK_GRAFT_DRILL_FS=fileobj \
  sbt -batch "runMain graft.DriverLossDrill" > /tmp/r17_ddrvf.log 2>&1
tail -c 500 DRILL_driver_loss_fileobj.json

# aux benches: anchor each vs_prev clause on the previous ROUND's committed
# artifact (same PREV_ROUND_COMMIT as the local bench), so a same-round
# driver re-run still compares against the real previous round; without the
# export the Scala mains fall back to the on-disk file they overwrite.
aux_prev() { # $1 = artifact name; prints env assignment or nothing
  if [ -n "$PREV_ROUND_COMMIT" ] && \
     git show "$PREV_ROUND_COMMIT:$1" > "/tmp/prev_$1" 2>/dev/null; then
    echo "SPARK_GRAFT_AUX_PREV=/tmp/prev_$1"
  fi
}

step "cdc bench"
env $(aux_prev BENCH_cdc.json) sbt -batch "runMain graft.CdcBench" > /tmp/r17_cdc.log 2>&1
grep '"metric":"cdc_throughput"' /tmp/r17_cdc.log | sed 's/^\[info\] //' | tail -1 | python3 -m json.tool > /dev/null
grep '"metric":"cdc_throughput"' /tmp/r17_cdc.log | sed 's/^\[info\] //' | tail -1 > BENCH_cdc.json
grep -o '"vs_prev":"[^"]*"' BENCH_cdc.json || true

step "ingest bench"
env $(aux_prev BENCH_ingest.json) sbt -batch "runMain graft.IngestBench" > /tmp/r17_ingest.log 2>&1
grep -o '"vs_prev":"[^"]*"' BENCH_ingest.json || true
tail -c 200 BENCH_ingest.json

step "media bench"
env $(aux_prev BENCH_media.json) sbt -batch "runMain graft.MediaIngestBench" > /tmp/r17_media.log 2>&1
grep -o '"vs_prev":"[^"]*"' BENCH_media.json || true
tail -c 200 BENCH_media.json

step "guards"
python3 tools/check_bench.py BENCH_cluster_r17.json /tmp/v17f BENCH_cluster_r17_queries.json
python3 tools/check_bench.py BENCH_cluster_r17.json /tmp/v17f bench_queries.json

step "DONE"
