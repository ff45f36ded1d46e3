#!/usr/bin/env bash
# detach_smoke.sh — end-to-end proof of docs/DETACH.md: a detached graft
# job SURVIVES the submitting process exiting.
#
# Sequence: package the repo jar, boot a throwaway standalone
# master+worker (all state under /tmp), submit DetachSmokeJob through
# tools/graft-submit (cluster deploy mode, no wait), verify the
# submitting process has exited while the job is still incomplete, then
# poll the job's OUTPUT (the only legitimate re-attach channel) for the
# result landing. PASS means: submitter dead first, results written
# after, by a driver the cluster owned.
#
# Intentionally NOT part of `sbt test` (boots daemons, ~1 min); run as:
#   tools/detach_smoke.sh
set -uo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
BASE=/tmp/graft-detach-smoke
OUT="$BASE/out"
export SPARK_HOME=/opt/spark
export SPARK_LOG_DIR="$BASE/logs" SPARK_PID_DIR="$BASE/pids"
export SPARK_WORKER_DIR="$BASE/work" SPARK_MASTER_HOST=localhost
export SPARK_WORKER_CORES=4 SPARK_WORKER_MEMORY=4g

fail() { echo "DETACH SMOKE: FAIL — $1"; teardown; exit 1; }
teardown() {
  "$SPARK_HOME/sbin/spark-daemon.sh" stop org.apache.spark.deploy.worker.Worker 1 >/dev/null 2>&1
  "$SPARK_HOME/sbin/spark-daemon.sh" stop org.apache.spark.deploy.master.Master 1 >/dev/null 2>&1
}

rm -rf "$BASE"; mkdir -p "$BASE/logs" "$BASE/pids" "$BASE/work"

echo "[1/5] packaging app jar"
(cd "$REPO" && sbt -batch package >/dev/null 2>&1) || fail "sbt package"

echo "[2/5] booting throwaway standalone master+worker (state under $BASE)"
"$SPARK_HOME/sbin/start-master.sh" >/dev/null 2>&1 || fail "start-master"
for i in $(seq 1 30); do
  grep -q "Starting Spark master at spark://" "$BASE"/logs/*Master*.out 2>/dev/null && break
  sleep 1; [ "$i" = 30 ] && fail "master did not come up"
done
"$SPARK_HOME/sbin/start-worker.sh" spark://localhost:7077 >/dev/null 2>&1 || fail "start-worker"
for i in $(seq 1 30); do
  grep -q "Successfully registered with master" "$BASE"/logs/*Worker*.out 2>/dev/null && break
  sleep 1; [ "$i" = 30 ] && fail "worker did not register"
done

echo "[3/5] submitting graft.DetachSmokeJob in cluster deploy mode"
GRAFT_MASTER=spark://localhost:7077 \
  "$REPO/tools/graft-submit" graft.DetachSmokeJob "$OUT" 32 250 \
  > "$BASE/submit.log" 2>&1
rc=$?
[ $rc -eq 0 ] || { tail -5 "$BASE/submit.log"; fail "spark-submit rc=$rc"; }
SUBMIT_EXITED_AT=$(date +%s)

echo "[4/5] submitter has exited (pid gone, rc=0); job must still be running"
if [ -f "$OUT/results.parquet/_SUCCESS" ]; then
  fail "results already complete at submitter exit — nothing was detached"
fi

echo "[5/5] polling the persisted output for the detached job's results"
for i in $(seq 1 120); do
  [ -f "$OUT/results.parquet/_SUCCESS" ] && [ -f "$OUT/jobs.parquet/_SUCCESS" ] && break
  sleep 1; [ "$i" = 120 ] && { tail -20 "$BASE"/work/*/*/stderr 2>/dev/null; fail "no results within 120s of submitter exit"; }
done
LANDED_AT=$(date +%s)

teardown
echo "DETACH SMOKE: PASS — submitter exited at t=0, driver (cluster-owned)"
echo "kept running and landed results.parquet + jobs.parquet at t=+$((LANDED_AT - SUBMIT_EXITED_AT))s"
echo "output: $OUT"
