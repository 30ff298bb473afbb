#!/bin/bash
# Capture the default test lane with a reproducible cold-cache header and an
# exit-code/timing trailer (ADVICE r4: the log must evidence the clean exit
# and the exact invocation, including the cache env that makes it "cold").
# Usage: bash scripts/run_default_lane.sh [output_log]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/TESTS_default_r05.log}

JC=$(mktemp -d /tmp/hvs_jax_cold_XXXX)
AC=$(mktemp -d /tmp/hvs_aot_cold_XXXX)
CMD="HVS_TEST_JAX_CACHE=$JC HVS_AOT_CACHE=$AC nice -n 10 python -m pytest tests/ -q --durations=60"

{
  echo "# TESTS_default — cold-cache default lane"
  echo "# invocation: $CMD"
  echo "# caches: HVS_TEST_JAX_CACHE=fresh mktemp dir (XLA compile cache), HVS_AOT_CACHE=fresh mktemp dir (engine AOT blobs) — both empty at start, so every XLA program compiles cold"
  echo "# host: 1-core VM; concurrent load at capture time: $(uptime)"
  echo "# date: $(date -u)"
} > "$OUT"

T0=$(date +%s.%N)
HVS_TEST_JAX_CACHE=$JC HVS_AOT_CACHE=$AC nice -n 10 \
  python -m pytest tests/ -q --durations=60 >> "$OUT" 2>&1
RC=$?
T1=$(date +%s.%N)

{
  echo "# wall_seconds: $(echo "$T1 $T0" | awk '{printf "%.2f", $1-$2}')"
  echo "# rc=$RC"
} >> "$OUT"
rm -rf "$JC" "$AC"
echo "lane rc=$RC -> $OUT"
exit $RC
