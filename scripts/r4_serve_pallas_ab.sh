#!/bin/bash
# A/B the SLA-bearing serve buckets (2/4) under the packed-Pallas serve
# default. The committed serve_rated8_b2_r04.json / serve_rated12_b2_r04.json /
# serve_overload_b4_r04.json are the XLA side (measured before commit 7b3554f
# made Pallas the TPU default); these runs are the Pallas side on identical
# parameters.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_logs
L=artifacts/r4_logs

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/serve_pallas_ab.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/serve_pallas_ab.log
  return $rc
}

run serve_rated8_b2_pallas 2800 python scripts/serve_bench.py --mode rated --rate 8 --bucket 2 \
  --checkpoint runs/r3/checkpoints/best --seconds 60 --image-size 640 \
  --jpeg-dir data/shapes640/val --output artifacts/serve_rated8_b2_pallas_r04.json
run serve_rated12_b2_pallas 1500 python scripts/serve_bench.py --mode rated --rate 12 --bucket 2 \
  --checkpoint runs/r3/checkpoints/best --seconds 60 --image-size 640 \
  --jpeg-dir data/shapes640/val --output artifacts/serve_rated12_b2_pallas_r04.json
run serve_overload_b4_pallas 2200 python scripts/serve_bench.py --mode overload --rate 120 --bucket 4 \
  --policy shed_oldest --checkpoint runs/r3/checkpoints/best --seconds 45 --image-size 640 \
  --jpeg-dir data/shapes640/val --output artifacts/serve_overload_b4_pallas_r04.json
echo "serve pallas A/B complete $(date -u)" | tee -a $L/serve_pallas_ab.log
