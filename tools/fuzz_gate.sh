#!/usr/bin/env bash
# Seeded degen-fuzz sweep (r14, streaming lens + seed window r15): N
# randomized degenerate corpora (tools/fuzz_degen.py — the same plant
# classes as make_degen.py at random rows/densities) each through the
# full Verify + DuckDB compare AND the streaming parity lens
# (graft.StreamDegen) with micro-batch boundaries drawn from the same
# seed. A failing seed is a REPRODUCIBLE latent cross-engine divergence:
#
#   bash tools/fuzz_gate.sh [N=4] [src=/root/testdata/sf0.001] [first_seed=1]
#   python3 tools/fuzz_degen.py <src> /tmp/graft_fuzz <failing-seed>   # repro
#   sbt "runMain graft.StreamDegen /tmp/graft_fuzz <failing-seed>"     # stream repro
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-4}"
SRC="${2:-/root/testdata/sf0.001}"
FIRST="${3:-1}"
mkdir -p /dev/shm/spark-local
for seed in $(seq "$FIRST" $((FIRST + N - 1))); do
  echo "=== fuzz gate: seed $seed (seeds $FIRST..$((FIRST + N - 1))) ==="
  python3 tools/fuzz_degen.py "$SRC" /tmp/graft_fuzz "$seed"
  rm -rf /tmp/graft_fuzz_out
  # Red path anchored on Verify's OWN per-query summary format
  # ("[verify] <name> FAILED" / "[verify] N queries FAILED"): a bare
  # `grep FAILED` also matched Spark's transient task-retry WARNs
  # (TASK_FAILED / "Stage ... failed" on retried-then-succeeded tasks),
  # killing a green sweep as a false red. The if guards the pipeline
  # under set -e: grep finding no match exits 1, which must NOT kill
  # the sweep (an sbt crash surfaces at the oracle step on the missing
  # dump).
  if sbt -batch "runMain graft.Verify /tmp/graft_fuzz /tmp/graft_fuzz_out" 2>&1 \
      | grep -E '\[verify\].*FAILED'; then
    echo "FUZZ GATE RED (verify failure, seed $seed)"; exit 1
  fi
  python3 tools/check_oracle.py /tmp/graft_fuzz_out /tmp/graft_fuzz \
    | tail -1 | grep -q " FAIL=0 " \
    || { echo "FUZZ GATE RED (oracle mismatch, seed $seed — rerun fuzz_degen.py with this seed to repro)"; exit 1; }
  # Streaming lens on the SAME fuzzed corpus, micro-batch boundaries
  # drawn from the seed: fixed plants miss position/density-dependent
  # divergences, and streams add the axis the batch fuzzer never varies
  # — WHERE the split falls relative to a planted row.
  sbt -batch "runMain graft.StreamDegen /tmp/graft_fuzz $seed" \
    || { echo "FUZZ GATE RED (streaming parity, seed $seed — rerun StreamDegen with this seed to repro)"; exit 1; }
  # Docstore pruning lens (r16): rebuild a bloom+zone-mapped collection
  # from the fuzzed events and assert prune decisions over DEGENERATE
  # statistics (all-null zone maps, extreme-magnitude ids) match the
  # brute filter — with pruning required to actually engage.
  sbt -batch "runMain graft.DocStoreDegenProbe /tmp/graft_fuzz" \
    || { echo "FUZZ GATE RED (docstore degen probe, seed $seed)"; exit 1; }
  echo "seed $seed GREEN"
done
echo "FUZZ GATE GREEN ($N seeds from $FIRST)"
