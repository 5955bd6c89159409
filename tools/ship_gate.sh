#!/usr/bin/env bash
# End-of-round shipping gate: the repo may not ship unless BOTH the
# behavioral suite (sbt test) AND the plan-shape suite (graft.PlanCheck,
# exit 1 on any FAIL) are green. Run from the repo root:
#
#   bash tools/ship_gate.sh [sf_dir]
#
# PlanCheck exists because a plan regression (lost pushdown, stray
# shuffle, stale salt column) can ship while every value-level test stays
# green — round 5 shipped a red PlanCheck row for exactly that reason.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
mkdir -p /dev/shm/spark-local

echo "=== ship gate 1/2: sbt test ==="
sbt -batch test

echo "=== ship gate 2/2: graft.PlanCheck ($SF_DIR) ==="
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.PlanCheck"

echo "SHIP GATE GREEN"
