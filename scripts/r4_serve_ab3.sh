#!/bin/bash
# Order-robust serve A/B: the ab2 pass showed a first-run penalty (the first
# serve_bench process after idle measures ~2-3x worse tails on BOTH sides —
# tunnel warm-up ramp), which aliased into the side comparison. Protocol:
# one throwaway warm run, then interleaved x,p,x,p repeats; compare per-side
# BEST (tunnel weather only ever adds latency).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_logs
L=artifacts/r4_logs
XLA_GATE=1000000000000

run() {  # run <name> <timeout_s> <gate> <extra args...>
  local name=$1 t=$2 gate=$3; shift 3
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/serve_ab3.log
  timeout "$t" env HVS_PALLAS_MIN_TOKENS=$gate python scripts/serve_bench.py \
    --checkpoint runs/r3/checkpoints/best --image-size 640 \
    --jpeg-dir data/shapes640/val "$@" > "$L/$name.log" 2>&1
  echo "$name rc=$?" | tee -a $L/serve_ab3.log
}

RATED="--mode rated --rate 8 --bucket 2 --seconds 60"
OVER="--mode overload --rate 120 --bucket 4 --policy shed_oldest --seconds 45"

# Throwaway warm run (absorbs the first-run tunnel ramp; result discarded).
run ab3_warmdiscard 900 $XLA_GATE $RATED --output /tmp/ab3_warm_discard.json

for rep in 1 2; do
  run ab3_rated8_xla$rep 900 $XLA_GATE $RATED --output artifacts/ab3_rated8_b2_xla${rep}_r04.json
  run ab3_rated8_pallas$rep 900 8192 $RATED --output artifacts/ab3_rated8_b2_pallas${rep}_r04.json
done
for rep in 1 2; do
  run ab3_overload_xla$rep 900 $XLA_GATE $OVER --output artifacts/ab3_overload_b4_xla${rep}_r04.json
  run ab3_overload_pallas$rep 900 8192 $OVER --output artifacts/ab3_overload_b4_pallas${rep}_r04.json
done
echo "ab3 complete $(date -u)" | tee -a $L/serve_ab3.log
