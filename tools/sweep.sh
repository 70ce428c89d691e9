#!/usr/bin/env bash
# Full quiet-box sweep with the round-15 gate, self-committing.
#
# Usage: tools/sweep.sh <round-number>
#
# 1. Runs graft.Bench over EVERY registered query at sf0.1 (quiet box —
#    do NOT run sbt test or other timing jobs concurrently).
# 2. Applies the floored 2x gate (BASELINE.md "Gate definition"):
#    ratio = sweep_sec / max(pin, 0.5 s); >2x readings are auto-isolated
#    (3 SPARK_GRAFT_ONLY runs) inside the sweep and recorded.
# 3. Writes BENCH_LOCAL_r{N}.json and COMMITS it together with
#    BENCH_FULL.json — round evidence can no longer be left dirty in the
#    working tree (the round-12/13/14 repeat finding).
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/sweep.sh <round-number>}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

echo "== full sweep: round $ROUND on $SF =="
SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E '# BENCH|\{"metric"' | sed 's/^\[info\] //' | tail -8

GATE_RC=0
python3 tools/sweep_gate.py "$ROUND" "$SF" || GATE_RC=$?

git add "BENCH_LOCAL_r${ROUND}.json" BENCH_FULL.json
git commit -m "Round-${ROUND} sweep evidence: full per-query timings, floored 2x gate

No-Verification-Needed: benchmark-evidence artifacts only, no source change" \
  || echo "(nothing to commit — artifacts unchanged)"

exit "$GATE_RC"
