#!/bin/bash
# Round-5b runsheet: the 80-class evidence chain rerun after the objectness
# normalization fix (losses.py) + class-prior head bias init, with the serve
# SLA reps LAST and strictly serialized — the first r5 capture ran the reps
# while diagnostic processes contended for the device lock, which poisoned
# every latency number (p95 344-507 ms, service_ms_b1 533 ms vs ~5 ms clean).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_logs artifacts/r5_serve
L=artifacts/r5_logs

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/runsheet_b.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/runsheet_b.log
  return $rc
}

CKPT=runs/r5b/checkpoints/best
DATA=data/shapes80_640

run tpu_wait 900 python scripts/tpu_recover.py --wait

# Fresh per-session tunnel floor (the SLA medians are quoted vs this).
run tunnel_probe_b 2400 python scripts/tunnel_probe.py \
  --output artifacts/tunnel_probe_r05.json

# The 80-class 50k-step training run under the fixed loss.
run train80b 18000 python scripts/train_device.py --data-root $DATA \
  --total-steps 50000 --train-sizes 416,640 --num-classes 80 \
  --run-dir runs/r5b

# Stability summary from the fresh run (CPU-only, cheap).
run stability_b 600 python scripts/summarize_run.py \
  --steps runs/r5b/steps.jsonl --chunks runs/r5b/chunks.jsonl \
  --report runs/r5b/stability_report.json --output STABILITY_r05.json

# FPS-paired accuracy sweep on the trained-80 checkpoint.
run accuracy_b 7200 python scripts/accuracy_sweep.py \
  --checkpoint $CKPT --data-root $DATA \
  --resolutions 320,416,512,640 --output ACCURACY_r05.json

# Headline bench from the trained 80-class weights.
HVS_BENCH_CHECKPOINT=$CKPT run bench_trained80b 1800 python bench.py

# Median-grade serve SLA: one warm discard, then 5 INTERLEAVED reps of each
# config. Nothing else touches the TPU or the host core during these.
run serve_warm_discard 900 python scripts/serve_bench.py --mode rated \
  --rate 8 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
  --jpeg-dir $DATA/val --output /tmp/r5_warm_discard.json
for rep in 1 2 3 4 5; do
  run serve_rated8b_rep$rep 900 python scripts/serve_bench.py --mode rated \
    --rate 8 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
    --jpeg-dir $DATA/val --output artifacts/r5_serve/rated8b_rep$rep.json
  run serve_rated12b_rep$rep 900 python scripts/serve_bench.py --mode rated \
    --rate 12 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
    --jpeg-dir $DATA/val --output artifacts/r5_serve/rated12b_rep$rep.json
  run serve_overloadb_rep$rep 900 python scripts/serve_bench.py --mode overload \
    --rate 120 --bucket 4 --policy shed_oldest --seconds 45 --image-size 640 \
    --checkpoint $CKPT --jpeg-dir $DATA/val \
    --output artifacts/r5_serve/overloadb_rep$rep.json
done

run serve_report_b 300 python scripts/serve_report.py \
  --probe artifacts/tunnel_probe_r05.json \
  --runs rated=artifacts/r5_serve/rated8b_rep3.json \
         rated12=artifacts/r5_serve/rated12b_rep3.json \
         overload=artifacts/r5_serve/overloadb_rep3.json \
  --device-bench BENCH_r04.json --frame-shape 640x640x3 \
  --output SERVE_SUSTAINED_r05.json
run serve_medians_b 300 python scripts/serve_median_report.py \
  --config "rated8=artifacts/r5_serve/rated8b_rep*.json" \
  --config "rated12=artifacts/r5_serve/rated12b_rep*.json" \
  --config "overload=artifacts/r5_serve/overloadb_rep*.json" \
  --probe artifacts/tunnel_probe_r05.json --frame-shape 640x640x3 \
  --output artifacts/SERVE_MEDIANS_r05.json \
  --merge-into SERVE_SUSTAINED_r05.json

# Train roofline rerun with device-resident timed batches (the first capture
# measured degraded-tunnel H2D transfers, not compute).
run train_roofline_b 3600 python scripts/train_roofline.py --data-root $DATA \
  --output TRAIN_ROOFLINE_r05.json

echo "runsheet_b complete $(date -u)" | tee -a $L/runsheet_b.log
