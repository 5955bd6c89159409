#!/usr/bin/env bash
# Seeded degen-fuzz sweep (r14): N randomized degenerate corpora
# (tools/fuzz_degen.py — the same plant classes as make_degen.py at
# random rows/densities) each through the full Verify + DuckDB compare.
# A failing seed is a REPRODUCIBLE latent cross-engine divergence:
#
#   bash tools/fuzz_gate.sh [N=4] [src=/root/testdata/sf0.001]
#   python3 tools/fuzz_degen.py <src> /tmp/graft_fuzz <failing-seed>   # repro
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-4}"
SRC="${2:-/root/testdata/sf0.001}"
mkdir -p /dev/shm/spark-local
for seed in $(seq 1 "$N"); do
  echo "=== fuzz gate: seed $seed/$N ==="
  python3 tools/fuzz_degen.py "$SRC" /tmp/graft_fuzz "$seed"
  rm -rf /tmp/graft_fuzz_out
  # the if guards the pipeline under set -e: grep finding a FAILED line
  # is the red path; grep finding none exits 1, which must NOT kill the
  # sweep (and any sbt crash surfaces at the oracle step on the missing
  # dump)
  if sbt -batch "runMain graft.Verify /tmp/graft_fuzz /tmp/graft_fuzz_out" 2>&1 \
      | grep FAILED; then
    echo "FUZZ GATE RED (verify failure, seed $seed)"; exit 1
  fi
  python3 tools/check_oracle.py /tmp/graft_fuzz_out /tmp/graft_fuzz \
    | tail -1 | grep -q " FAIL=0 " \
    || { echo "FUZZ GATE RED (oracle mismatch, seed $seed — rerun fuzz_degen.py with this seed to repro)"; exit 1; }
  echo "seed $seed GREEN"
done
echo "FUZZ GATE GREEN ($N seeds)"
