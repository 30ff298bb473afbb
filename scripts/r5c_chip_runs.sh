#!/bin/bash
# Round-5c runsheet: the 80-class retrain under the class-loss convergence fix
# (losses.py cls_mode/cls_pos_weight — plain 80-way BCE left class argmax
# accuracy at 0.000 after 50k steps, see ACCURACY_r05 evidence commit), then
# the full accuracy/bench evidence chain from the retrained checkpoint.
# CLS_ARGS is set by the launcher to the A/B winner.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_logs
L=artifacts/r5_logs
CLS_ARGS=${CLS_ARGS:---cls-loss softmax}

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/runsheet_c.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/runsheet_c.log
  return $rc
}

CKPT=runs/r5c/checkpoints/best
DATA=data/shapes80_640

run tpu_wait_c 900 python scripts/tpu_recover.py --wait

run train80c 18000 python scripts/train_device.py --data-root $DATA \
  --total-steps 50000 --train-sizes 416,640 --num-classes 80 $CLS_ARGS \
  --run-dir runs/r5c

run stability_c 600 python scripts/summarize_run.py \
  --steps runs/r5c/steps.jsonl --chunks runs/r5c/chunks.jsonl \
  --report runs/r5c/stability_report.json --output STABILITY_r05.json

run accuracy_c 7200 python scripts/accuracy_sweep.py \
  --checkpoint $CKPT --data-root $DATA \
  --resolutions 320,416,512,640 --output ACCURACY_r05.json

HVS_BENCH_CHECKPOINT=$CKPT run bench_trained80c 1800 python bench.py

echo "runsheet_c complete $(date -u)" | tee -a $L/runsheet_c.log
