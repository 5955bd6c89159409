#!/usr/bin/env bash
# Bulk seed hunt for the r16 unexplained StreamCrashFuzzSpec restart red
# (r17 verdict task 1). Runs the spec OUTSIDE sbt (classpath exported
# once) so batches can run beside other build work, in batches of
# $BATCH seeds, starting at $BASE, for $BATCHES batches. Stops at the
# first red with the spec's self-diagnosis (PEER-ERROR lines, target /
# commit-log / checkpoint snapshots) preserved in the batch log.
#
#   bash tools/stream_crash_hunt.sh <classpath-file> <base> <batches> [batch=25] [logdir=/tmp/scf_hunt]
set -uo pipefail
CP_FILE="$(readlink -f "$1")" # resolve against the INVOKER's cwd, before the cd
cd "$(dirname "$0")/.."
BASE="$2"; BATCHES="$3"; BATCH="${4:-25}"; LOGDIR="${5:-/tmp/scf_hunt}"
CP="$(cat "$CP_FILE")" || { echo "cannot read classpath file $CP_FILE" >&2; exit 2; }
mkdir -p "$LOGDIR"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for ((i=0; i<BATCHES; i++)); do
  base=$((BASE + i * BATCH))
  log="$LOGDIR/batch_${base}.log"
  echo "=== hunt batch $((i+1))/$BATCHES: seeds $base..$((base + BATCH - 1)) ==="
  GRAFT_STREAM_CRASH_SEED_BASE="$base" GRAFT_STREAM_CRASH_SEEDS="$BATCH" \
    java $ADD_OPENS -Xmx8g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" org.scalatest.tools.Runner \
      -s graft.StreamCrashFuzzSpec -oW > "$log" 2>&1
  rc=$?
  if [ $rc -ne 0 ] || ! grep -q "All tests passed" "$log"; then
    echo "HUNT RED: batch base $base (rc=$rc) — diagnosis in $log"
    grep -E "PEER-ERROR|restart run failed|target|checkpoint|seed [0-9]+:" "$log" | head -40
    exit 1
  fi
  echo "batch base $base GREEN ($BATCH seeds)"
done
echo "HUNT GREEN: $((BATCHES * BATCH)) seeds from $BASE, zero reds"
