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

echo "=== ship gate 1/4: sbt test ==="
sbt -batch test

echo "=== ship gate 2/4: graft.PlanCheck ($SF_DIR) ==="
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.PlanCheck"

# Plan-shape drift gate (r12): every query's physical fingerprint diffed
# against the committed prior round's record (BENCH_BASELINE.json —
# refresh at round start with `git show HEAD:bench_last.json >
# BENCH_BASELINE.json` once the driver's capture is committed). A silent
# plan flip INSIDE PlanCheck's invariants — broadcast→sort-merge, a new
# exchange — fails here like a bench regression would. Plans at sf0.1:
# fingerprints are size-statistics dependent, and sf0.1 is where the
# baseline records them.
echo "=== ship gate 3/4: graft.PlanDrift (plan fingerprints vs committed baseline) ==="
sbt -batch "runMain graft.PlanDrift"

# Stage 4 (DEFAULT-ON since r13): the degenerate-input gate — the
# full Verify + DuckDB compare against a corpus with a null-valued
# event, k-less props, null-text doc, and zero-norm embedding planted
# (tools/make_degen.py). Catches cross-engine null/NaN divergences the
# clean driver testdata never exercises — it found ~40 divergences
# across r11-r12 while it was opt-in, which is exactly why it no longer
# is. ~3 min; skip explicitly with GRAFT_NO_DEGEN=1 (quick mid-iteration
# runs only — a shipping gate run must include it).
if [[ "${GRAFT_NO_DEGEN:-0}" != "1" ]]; then
  echo "=== ship gate 4/4: degenerate-input gate ==="
  python3 tools/make_degen.py /root/testdata/sf0.001 /tmp/graft_degen
  rm -rf /tmp/graft_degen_out
  sbt -batch "runMain graft.Verify /tmp/graft_degen /tmp/graft_degen_out"
  python3 tools/check_oracle.py /tmp/graft_degen_out /tmp/graft_degen \
    | tail -1 | grep -q " FAIL=0 " || { echo "DEGEN GATE RED"; exit 1; }
  echo "DEGEN GATE GREEN"
  # r14: the degen lens for the STREAMING twins — twelve (r16: every stateful fold)
  # streams fed the degen corpus itself across micro-batch splits,
  # parity-checked against their batch twins (graft.StreamDegen exits 1
  # on divergence; found the null-key->0 encoder fold on its first run)
  echo "=== ship gate 4b: streaming degen parity ==="
  sbt -batch "runMain graft.StreamDegen /tmp/graft_degen" || { echo "STREAM DEGEN RED"; exit 1; }
  # Stage 4c (r15): ONE rotating fuzz seed per gate run. The fuzzer is
  # the repo's highest-yield bug-finder (4 real cross-engine divergences
  # in its first 3 sweeps, commit 10c4168) and used to be a manual step
  # someone had to remember. The seed rotates HOURLY (day-granular would
  # re-explore one corpus across a whole day's regates) so successive
  # gate runs explore new corpora + split schedules while staying
  # reproducible (the seed is echoed; override with GRAFT_FUZZ_SEED).
  # Runs batch Verify+oracle AND the seeded streaming lens (~4 min).
  FUZZ_SEED="${GRAFT_FUZZ_SEED:-$(date +%Y%m%d%H)}"
  echo "=== ship gate 4c: rotating-seed degen fuzz (seed $FUZZ_SEED) ==="
  bash tools/fuzz_gate.sh 1 /root/testdata/sf0.001 "$FUZZ_SEED"
fi

# Optional fourth stage (GRAFT_SCALE=1): the one-command x10 re-cert —
# full Bench against the 10x corpus (built if absent), decade ratio
# gated against the committed sf0.1 baseline, bench_last.json protected.
# ~15 min; run once per round after correctness is green.
if [[ "${GRAFT_SCALE:-0}" == "1" ]]; then
  echo "=== ship gate scale: x10 re-certification ==="
  bash tools/scale_gate.sh
fi

echo "SHIP GATE GREEN"
