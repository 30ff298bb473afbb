#!/bin/bash
# Capture the heavy test lane (integration tests: 8-device dryrun entrypoint,
# 2-process multihost grads-equal, cross-topology checkpoint restore, long
# gradient-stability runs) with the same reproducible header/trailer contract
# as scripts/run_default_lane.sh (ADVICE r4: logs must evidence the exact
# invocation and the clean exit).
# Usage: bash scripts/run_heavy_lane.sh [output_log]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/TESTS_heavy_r05.log}

CMD="nice -n 10 python -m pytest tests/ -q -m heavy --durations=10"

{
  echo "# TESTS_heavy — heavy lane (pytest -m heavy)"
  echo "# invocation: $CMD"
  echo "# host: 1-core VM; concurrent load at capture time: $(uptime)"
  echo "# date: $(date -u)"
} > "$OUT"

T0=$(date +%s.%N)
nice -n 10 python -m pytest tests/ -q -m heavy --durations=10 >> "$OUT" 2>&1
RC=$?
T1=$(date +%s.%N)

{
  echo "# wall_seconds: $(echo "$T1 $T0" | awk '{printf "%.2f", $1-$2}')"
  echo "# rc=$RC"
} >> "$OUT"
echo "heavy lane rc=$RC -> $OUT"
exit $RC
