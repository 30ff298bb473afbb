#!/bin/bash
# Round-4 on-chip evidence runsheet. Run ONLY when scripts/tpu_recover.py
# reports healthy, and ONLY after stopping the background probe loop
# (kill $(cat /tmp/tpu_recover.pid)) — one TPU process at a time.
#
# Ordered by value-per-minute so a re-wedge mid-sheet still leaves the most
# important artifacts behind. Each step logs to artifacts/r4_logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_logs
L=artifacts/r4_logs

# A CPU-heavy job on this 1-core host starves TPU dispatch and craters
# timing runs 20x — stop any known background CPU jobs first (by pidfile,
# never by pattern).
for pf in /tmp/mt.pid /tmp/q.pid /tmp/drive.pid; do
  if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
    kill "$(cat "$pf")" 2>/dev/null
    echo "stopped CPU job $(cat "$pf") ($pf)" | tee -a $L/runsheet.log
  fi
done
sleep 5

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/runsheet.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/runsheet.log
  return $rc
}

# 1. Headline float bench (BENCH_r04 material).
run bench_float 1800 python bench.py

# 2. Int8 benches (throughput of the quantized programs).
HVS_BENCH_QUANT=1 run bench_quant1 1800 python bench.py
HVS_BENCH_QUANT=2 run bench_quant2 1800 python bench.py
HVS_BENCH_QUANT=3 run bench_quant3 1800 python bench.py
HVS_BENCH_QUANT=4 run bench_quant4 1800 python bench.py

# 3. Int8 PTQ accuracy on the trained checkpoint -> QUANT_r04.json + scales.
run quantize 5400 python scripts/quantize.py \
  --checkpoint runs/r3/checkpoints/best --eval-fpn --eval-mhc --eval-vit \
  --data-root data/shapes640 --output QUANT_r04.json \
  --scales-out runs/r3/checkpoints/quant_scales.msgpack

# 4. Bytes attribution + roofline with the w1 fold -> ROOFLINE_r04.json.
run bytes 1800 python scripts/bytes_attribution.py --output artifacts/BYTES_r04.json
run roofline 2400 python scripts/roofline.py --output artifacts/ROOFLINE_r04.json

# 5. Accuracy at 640 with the folded serve path (mAP delta vs ACCURACY_r03)
#    + resolution sweep on the r3 checkpoint (VERDICT stretch item).
run accuracy 5400 python scripts/accuracy_sweep.py \
  --checkpoint runs/r3/checkpoints/best --data-root data/shapes640 \
  --resolutions 320,416,512,640 --output ACCURACY_r04.json

# 6. Serving SLA runs -> SERVE_SUSTAINED_r04.json material.
run serve_rated 1200 python scripts/serve_bench.py --mode rated --rate 25 \
  --seconds 60 --image-size 640 --jpeg-dir data/shapes640/val \
  --output artifacts/serve_rated25_r04.json
run serve_overload 1200 python scripts/serve_bench.py --mode overload \
  --rate 120 --seconds 45 --image-size 640 --jpeg-dir data/shapes640/val \
  --policy shed_oldest --output artifacts/serve_overload_r04.json
run serve_closed 1200 python scripts/serve_bench.py --mode closed \
  --seconds 45 --image-size 640 --jpeg-dir data/shapes640/val \
  --output artifacts/serve_closed_r04.json

# 7. Segmentation result run (longest): 20k steps @416 on the dense set.
run multitask 28800 python scripts/train_multitask.py --size 416 \
  --steps 20000 --num-train 1600 --num-val 200 --batch-size 8 \
  --data-root data/shapes_mt416 --output MULTITASK_r04.json

echo "runsheet complete $(date -u)" | tee -a $L/runsheet.log
