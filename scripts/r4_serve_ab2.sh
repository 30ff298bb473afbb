#!/bin/bash
# Controlled serve A/B: XLA vs packed-Pallas default, interleaved back-to-back
# under one tunnel session. The first A/B (r4_serve_pallas_ab.sh) ran its
# Pallas side hours after the XLA side and disagreed with the device
# microbench (PALLAS_GATE_r04.json: Pallas is FASTER at batch 4/16); this run
# removes the time-of-day confound. XLA side = HVS_PALLAS_MIN_TOKENS bignum.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_logs
L=artifacts/r4_logs
XLA_GATE=1000000000000

run() {  # run <name> <timeout_s> <env...> -- <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/serve_ab2.log
  timeout "$t" env "$@" > "$L/$name.log" 2>&1
  echo "$name rc=$?" | tee -a $L/serve_ab2.log
}

for side in xla pallas; do
  if [ $side = xla ]; then E="HVS_PALLAS_MIN_TOKENS=$XLA_GATE"; else E="HVS_PALLAS_MIN_TOKENS=8192"; fi
  run ab2_rated8_b2_$side 900 $E python scripts/serve_bench.py --mode rated --rate 8 --bucket 2 \
    --checkpoint runs/r3/checkpoints/best --seconds 60 --image-size 640 \
    --jpeg-dir data/shapes640/val --output artifacts/ab2_rated8_b2_${side}_r04.json
done
for side in xla pallas; do
  if [ $side = xla ]; then E="HVS_PALLAS_MIN_TOKENS=$XLA_GATE"; else E="HVS_PALLAS_MIN_TOKENS=8192"; fi
  run ab2_overload_b4_$side 900 $E python scripts/serve_bench.py --mode overload --rate 120 --bucket 4 \
    --policy shed_oldest --checkpoint runs/r3/checkpoints/best --seconds 45 --image-size 640 \
    --jpeg-dir data/shapes640/val --output artifacts/ab2_overload_b4_${side}_r04.json
done
echo "ab2 complete $(date -u)" | tee -a $L/serve_ab2.log
