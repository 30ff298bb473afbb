#!/bin/bash
# Round-4 on-chip runsheet, part 2 — everything after the 50k training rerun.
# Steps 1-2 of r4_chip_runs.sh (float + int8 benches) already ran and are
# committed; this sheet produces the remaining round-4 evidence artifacts.
# One TPU process at a time; no CPU-heavy background jobs during timing runs.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_logs
L=artifacts/r4_logs

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/runsheet2.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/runsheet2.log
  return $rc
}

# 1. Int8 PTQ accuracy on the trained checkpoint -> QUANT_r04.json + scales.
run quantize 5400 python scripts/quantize.py \
  --checkpoint runs/r3/checkpoints/best --eval-fpn --eval-mhc --eval-vit \
  --data-root data/shapes640 --output QUANT_r04.json \
  --scales-out runs/r3/checkpoints/quant_scales.msgpack

# 2. Bytes attribution + roofline with the w1 fold -> ROOFLINE_r04.json.
run bytes 1800 python scripts/bytes_attribution.py --output artifacts/BYTES_r04.json
run roofline 2400 python scripts/roofline.py --output artifacts/ROOFLINE_r04.json

# 3. Accuracy at 640 with the folded serve path + FPS-paired resolution sweep.
run accuracy 5400 python scripts/accuracy_sweep.py \
  --checkpoint runs/r3/checkpoints/best --data-root data/shapes640 \
  --resolutions 320,416,512,640 --output ACCURACY_r04.json

# 4. Fresh tunnel component probe on this VM (floor may differ from r3's).
run tunnel_probe 1200 python scripts/tunnel_probe.py \
  --output artifacts/tunnel_probe_r04.json

# 5. Serving SLA runs.
run serve_rated 1200 python scripts/serve_bench.py --mode rated --rate 25 --checkpoint runs/r3/checkpoints/best \
  --seconds 60 --image-size 640 --jpeg-dir data/shapes640/val \
  --output artifacts/serve_rated25_r04.json
run serve_overload 1200 python scripts/serve_bench.py --mode overload --checkpoint runs/r3/checkpoints/best \
  --rate 120 --seconds 45 --image-size 640 --jpeg-dir data/shapes640/val \
  --policy shed_oldest --output artifacts/serve_overload_r04.json
run serve_closed 1200 python scripts/serve_bench.py --mode closed --checkpoint runs/r3/checkpoints/best \
  --seconds 45 --image-size 640 --jpeg-dir data/shapes640/val \
  --output artifacts/serve_closed_r04.json

# 6. Assemble SERVE_SUSTAINED_r04.json from the measured artifacts.
run serve_report 600 python scripts/serve_report.py \
  --probe artifacts/tunnel_probe_r04.json \
  --runs closed=artifacts/serve_closed_r04.json \
         rated=artifacts/serve_rated25_r04.json \
         overload=artifacts/serve_overload_r04.json \
  --device-bench artifacts/BENCH_float_r04.json --output SERVE_SUSTAINED_r04.json

# 7. Segmentation result run (longest): 20k steps @416 on the dense set.
#    train_multitask generates data/shapes_mt416 itself if missing.
run multitask 28800 python scripts/train_multitask.py --size 416 \
  --steps 20000 --num-train 1600 --num-val 200 --batch-size 8 \
  --data-root data/shapes_mt416 --output MULTITASK_r04.json

echo "runsheet2 complete $(date -u)" | tee -a $L/runsheet2.log
