#!/bin/bash
# Round-4 serve SLA re-run: steps 5-6 of r4_chip_runs2.sh, after fixing the
# num_classes inference (serve_bench now reads it from the checkpoint).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_logs
L=artifacts/r4_logs

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/serve_rerun.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/serve_rerun.log
  return $rc
}

run serve_rated 1200 python scripts/serve_bench.py --mode rated --rate 25 --checkpoint runs/r3/checkpoints/best \
  --seconds 60 --image-size 640 --jpeg-dir data/shapes640/val \
  --output artifacts/serve_rated25_r04.json
run serve_overload 1200 python scripts/serve_bench.py --mode overload --checkpoint runs/r3/checkpoints/best \
  --rate 120 --seconds 45 --image-size 640 --jpeg-dir data/shapes640/val \
  --policy shed_oldest --output artifacts/serve_overload_r04.json
run serve_closed 1200 python scripts/serve_bench.py --mode closed --checkpoint runs/r3/checkpoints/best \
  --seconds 45 --image-size 640 --jpeg-dir data/shapes640/val \
  --output artifacts/serve_closed_r04.json
run serve_report 600 python scripts/serve_report.py \
  --probe artifacts/tunnel_probe_r04.json \
  --runs closed=artifacts/serve_closed_r04.json \
         rated=artifacts/serve_rated25_r04.json \
         overload=artifacts/serve_overload_r04.json \
  --device-bench artifacts/BENCH_float_r04.json --output SERVE_SUSTAINED_r04.json
echo "serve rerun complete $(date -u)" | tee -a $L/serve_rerun.log
