#!/usr/bin/env bash
# One-command skew story re-cert (r14): build the seeded hot-key corpus
# (one user owning ~30% of events at x10) and run graft.SkewProbe's five
# assertions — raw SMJ straggler, AQE skew-split engagement + straggler
# cut, salted-join result parity + spread flattening, the window
# single-task ceiling, and partial-agg skew absorption. See the SCALE.md
# "Skew" section for the measured numbers this gate pins.
set -euo pipefail
cd "$(dirname "$0")/.."
SRC="${1:-/root/testdata/sf0.1}"
DIR="${SKEW_DIR:-/tmp/graft_skew10}"
if [ ! -f "$DIR/events.parquet" ]; then
  python3 tools/make_scale10.py "$SRC" "$DIR" 10 --hot-user=0.3
fi
sbt -batch "runMain graft.SkewProbe $DIR"
# r15: the STREAMING stateful path's skew numbers — per-task spread of
# the flatMapGroupsWithState stage and the bounded-state contract under
# the hot key, for conversionStream + scd2Stream (see SCALE.md
# "Streaming skew"). Exits 1 on regression like SkewProbe.
sbt -batch "runMain graft.StreamSkewProbe $DIR"
