#!/usr/bin/env bash
# One-command x10 scale re-certification (r12): the manual recipe this
# scripts — make_scale10 + env-var Bench + compare + restore — had a
# known foot-gun (a non-sf0.1 Bench run OVERWRITES bench_last.json, the
# committed record; README note). The script:
#   1. builds the x10 corpus at $1 (default /tmp/graft_sfx10) if absent;
#   2. snapshots bench_last.json, runs the full Bench against x10,
#      captures the x10 record to scale10_last.json, restores the
#      snapshot;
#   3. ratios the x10 total against the committed sf0.1 baseline
#      (SCALE_GATE_BASELINE, default BENCH_BASELINE.json — the prior
#      round's driver capture) and gates on: run valid (zero failures)
#      AND decade ratio < 5.0 (measured rounds 9-11: 2.86-3.4×; the
#      bound leaves the README's ±20% VM drift outside the trip wire
#      while catching any operator gone superlinear).
#
#   bash tools/scale_gate.sh [x10_dir]
#
# The per-query x10 numbers land in scale10_last.json for SCALE.md's
# tables; the committed bench_last.json is untouched on every path.
set -euo pipefail
cd "$(dirname "$0")/.."
X10_DIR="${1:-/tmp/graft_sfx10}"
BASE="${SCALE_GATE_BASELINE:-BENCH_BASELINE.json}"
mkdir -p /dev/shm/spark-local

if [[ ! -f "$X10_DIR/events.parquet" ]]; then
  echo "=== scale gate: building x10 corpus at $X10_DIR ==="
  python3 tools/make_scale10.py /root/testdata/sf0.1 "$X10_DIR"
fi

SAVED="$(mktemp)"
RESTORE=0
if [[ -f bench_last.json ]]; then cp bench_last.json "$SAVED"; RESTORE=1; fi
restore() { if [[ "$RESTORE" == 1 ]]; then cp "$SAVED" bench_last.json; fi; rm -f "$SAVED"; }
trap restore EXIT

echo "=== scale gate: full Bench at x10 ($X10_DIR) ==="
# Snapshot the COMMITTED prior x10 record before overwriting it: its
# plans block is the x10 plan-drift baseline (r13 — fingerprints are
# size-statistics dependent, so a broadcast-threshold flip that
# manifests ONLY at x10, exactly the class AQE decides by runtime size,
# is invisible to the sf0.1 PlanDrift gate).
PREV_SCALE="$(mktemp)"
git show HEAD:scale10_last.json > "$PREV_SCALE" 2>/dev/null || echo "{}" > "$PREV_SCALE"
SPARK_GRAFT_SF_DIR="$X10_DIR" sbt -batch "runMain graft.Bench" | tail -3
cp bench_last.json scale10_last.json

# x10 plan-drift: diff the fresh fingerprints against the committed x10
# record. Intentional flips: SCALE_PLANDRIFT_EXPECT="q1,q2" (the next
# committed scale10_last.json absorbs them).
python3 - "$PREV_SCALE" <<'EOF'
import json, os, sys
cur = json.load(open("scale10_last.json"))
try:
    prev = json.load(open(sys.argv[1]))
except Exception:
    prev = {}
cp = cur.get("plans") or {}
pp = prev.get("plans") or {}
if cur.get("plan_drift") == "error" or not cp:
    print("SCALE PLANDRIFT ERROR: this run's fingerprint pass failed (plans missing)")
    sys.exit(1)
if not pp:
    print("SCALE PLANDRIFT RECORDING: no committed x10 plans block to diff "
          "(first fingerprinted x10 capture — gates once this record is committed)")
    sys.exit(0)
if prev.get("sf") != cur.get("sf"):
    print(f"SCALE PLANDRIFT SKIP: committed x10 record is for '{prev.get('sf')}', "
          f"this run planned '{cur.get('sf')}' — no comparable record (custom x10 dir?)")
    sys.exit(0)
expected = set(filter(None, os.environ.get("SCALE_PLANDRIFT_EXPECT", "").split(",")))
changed = {q: f"{pp[q]}->{v}" for q, v in sorted(cp.items())
           if q in pp and pp[q] != v and q not in expected}
new = [q for q in sorted(cp) if q not in pp]
if new:
    print(f"SCALE PLANDRIFT: {len(new)} new quer{'y' if len(new)==1 else 'ies'} "
          f"(no x10 baseline entry): {', '.join(new)}")
# a query in the committed record but absent from this run was dropped
# from (or failed out of) the registry — exactly what the gate exists to
# catch; absorb intentional removals via SCALE_PLANDRIFT_EXPECT
removed = [q for q in sorted(pp) if q not in cp and q not in expected]
for q in removed:
    print(f"SCALE REMOVED {q}: in committed x10 record, absent from this run")
for q, d in changed.items():
    print(f"SCALE DELTA {q}: {d} (undocumented x10 plan flip)")
if changed or removed:
    print(f"SCALE PLANDRIFT {len(changed)} UNDOCUMENTED X10 DELTAS, "
          f"{len(removed)} REMOVED")
    sys.exit(1)
print(f"SCALE PLANDRIFT OK ({len(cp)} x10 fingerprints match the committed record)")
EOF
rm -f "$PREV_SCALE"

python3 - "$BASE" <<'EOF'
import json, sys
x10 = json.load(open("scale10_last.json"))
base = json.load(open(sys.argv[1]))
ratio = x10["value"] / base["value"]
print(f"SCALE GATE: x10 {x10['value']:.1f}s / sf0.1 {base['value']:.1f}s "
      f"({sys.argv[1]}) = {ratio:.2f}x per decade; valid={x10['valid']}, "
      f"failed={x10['failed']}")
ok = x10["valid"] and ratio < 5.0
print("SCALE GATE GREEN" if ok else "SCALE GATE RED")
sys.exit(0 if ok else 1)
EOF
