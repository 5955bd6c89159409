#!/usr/bin/env bash
# Round-start baseline refresh (r12): snapshot the PRIOR round's
# committed driver bench capture as the drift/plan-drift baseline for
# this round. Run ONCE at round start, after reading the new VERDICT:
#
#   bash tools/new_round.sh
#
# Bench's "drift" (timing ratios) and "plan_drift" (physical-plan
# fingerprints), plus the standalone graft.PlanDrift ship-gate stage,
# all resolve against BENCH_BASELINE.json — so refreshing it here makes
# every in-round comparison capture-to-capture, the comparison the
# judge makes. In-round intentional plan flips go in
# PlanFingerprint.expectedDeltas until the next refresh absorbs them.
set -euo pipefail
cd "$(dirname "$0")/.."

git show HEAD:bench_last.json > BENCH_BASELINE.json
python3 - <<'EOF'
import json, sys
d = json.load(open("BENCH_BASELINE.json"))
if "plans" in d and d["plans"] is None:
    # Bench's r13 failure marker: the capture's own fingerprint pass
    # FAILED. Refusing here keeps a broken record from becoming the
    # gate baseline (which would report every query NEW next round).
    sys.exit("REFUSED: capture carries plans:null — its fingerprint pass "
             "failed; fix that and re-bench before refreshing the baseline")
plans = d.get("plans")
print(f"baseline refreshed: total={d['value']}s sf={d['sf']} "
      f"queries={len(d.get('queries', {}))} "
      f"plans={'none (pre-r12 record — PlanDrift records-only this round)' if plans is None else len(plans)}")
EOF
echo "commit it: git add BENCH_BASELINE.json && git commit -m 'Refresh round baseline from the committed driver capture'"
