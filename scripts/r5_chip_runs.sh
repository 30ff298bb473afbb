#!/bin/bash
# Round-5 on-chip evidence runsheet. Run ONLY when scripts/tpu_recover.py
# reports healthy, with no CPU-heavy background jobs (1-core host: a busy
# core starves TPU dispatch and craters timing runs — r4 lesson).
#
# Ordered by dependency then value-per-minute: the 80-class training run
# produces the checkpoint every later artifact uses.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_logs artifacts/r5_serve
L=artifacts/r5_logs

for pf in /tmp/dryrun.pid /tmp/gen80.pid /tmp/q.pid; do
  if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
    echo "WARNING: CPU job $(cat "$pf") ($pf) still alive — waiting" \
      | tee -a $L/runsheet.log
    while kill -0 "$(cat "$pf")" 2>/dev/null; do sleep 20; done
  fi
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/runsheet.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/runsheet.log
  return $rc
}

CKPT=runs/r5/checkpoints/best
DATA=data/shapes80_640

# 0a. Detection-head norm-fusion ceiling FIRST (quick, ~15 min): measuring
#     before the 4h training run means the fold can be implemented during
#     the training window instead of serializing after it.
run head_ceiling 2400 python scripts/head_fusion_ceiling.py

# 0b. Fresh tunnel component probe (per-session floor for the SLA medians).
run tunnel_probe 1200 python scripts/tunnel_probe.py \
  --output artifacts/tunnel_probe_r05.json

# 1. The 80-class 50k-step training run (VERDICT r5 task 1; ~3.5h at the
#    measured 4.2 steps/s blended 416/640 rate). Produces
#    runs/r5/checkpoints/{best,final} + steps.jsonl + stability report
#    -> STABILITY_r05.json material.
run train80 18000 python scripts/train_device.py --data-root $DATA \
  --total-steps 50000 --train-sizes 416,640 --num-classes 80 \
  --run-dir runs/r5

# 3. FPS-paired accuracy sweep on the trained-80 checkpoint, under the
#    SHIPPED serve default (closes r4 weak #3) -> ACCURACY_r05.json.
run accuracy 7200 python scripts/accuracy_sweep.py \
  --checkpoint $CKPT --data-root $DATA \
  --resolutions 320,416,512,640 --output ACCURACY_r05.json

# 4. Headline bench from the trained 80-class weights.
HVS_BENCH_CHECKPOINT=$CKPT run bench_trained80 1800 python bench.py
# Bucket sweep: is batch 16 still the ceiling of an 84%-HBM program?
HVS_BENCH_CHECKPOINT=$CKPT HVS_BENCH_BATCH=32 run bench_b32 1800 python bench.py
HVS_BENCH_CHECKPOINT=$CKPT HVS_BENCH_BATCH=64 run bench_b64 1800 python bench.py
HVS_BENCH_CHECKPOINT=$CKPT HVS_BENCH_BATCH=8  run bench_b8  1800 python bench.py

# 6. Roofline + bytes attribution under the r5 default -> ROOFLINE_r05/BYTES_r05.
run bytes 1800 python scripts/bytes_attribution.py --output artifacts/BYTES_r05.json
run roofline 2400 python scripts/roofline.py --buckets 8,16,32,64 \
  --output artifacts/ROOFLINE_r05.json

# 7. Train-step roofline + stage attribution -> TRAIN_ROOFLINE_r05.json.
run train_roofline 3600 python scripts/train_roofline.py --data-root $DATA \
  --output TRAIN_ROOFLINE_r05.json

# 8. Median-grade serve SLA: one warm discard, then 5 INTERLEAVED reps of
#    each config (VERDICT r5 task 3). Medians become the claim.
run serve_warm_discard 900 python scripts/serve_bench.py --mode rated \
  --rate 8 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
  --jpeg-dir $DATA/val --output /tmp/r5_warm_discard.json
for rep in 1 2 3 4 5; do
  run serve_rated8_rep$rep 900 python scripts/serve_bench.py --mode rated \
    --rate 8 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
    --jpeg-dir $DATA/val --output artifacts/r5_serve/rated8_rep$rep.json
  run serve_rated12_rep$rep 900 python scripts/serve_bench.py --mode rated \
    --rate 12 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
    --jpeg-dir $DATA/val --output artifacts/r5_serve/rated12_rep$rep.json
  run serve_overload_rep$rep 900 python scripts/serve_bench.py --mode overload \
    --rate 120 --bucket 4 --policy shed_oldest --seconds 45 --image-size 640 \
    --checkpoint $CKPT --jpeg-dir $DATA/val \
    --output artifacts/r5_serve/overload_rep$rep.json
done

# 9. Assemble SERVE_SUSTAINED_r05.json: component/ceiling analysis from the
#    fresh probe + median-rep runs, then inject the median SLA section (the
#    medians ARE the claim this round).
run serve_report 300 python scripts/serve_report.py \
  --probe artifacts/tunnel_probe_r05.json \
  --runs rated=artifacts/r5_serve/rated8_rep3.json \
         rated12=artifacts/r5_serve/rated12_rep3.json \
         overload=artifacts/r5_serve/overload_rep3.json \
  --device-bench BENCH_r04.json --frame-shape 640x640x3 \
  --output SERVE_SUSTAINED_r05.json
run serve_medians 300 python scripts/serve_median_report.py \
  --config "rated8=artifacts/r5_serve/rated8_rep*.json" \
  --config "rated12=artifacts/r5_serve/rated12_rep*.json" \
  --config "overload=artifacts/r5_serve/overload_rep*.json" \
  --probe artifacts/tunnel_probe_r05.json --frame-shape 640x640x3 \
  --output artifacts/SERVE_MEDIANS_r05.json \
  --merge-into SERVE_SUSTAINED_r05.json

echo "runsheet complete $(date -u)" | tee -a $L/runsheet.log
