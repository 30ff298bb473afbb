#!/bin/bash
# Round-5c serve SLA reps: the median-grade capture re-run on the FINAL
# trained 80-class checkpoint (runs/r5c) against its own same-session tunnel
# floor (artifacts/tunnel_probe_r05_late.json). Protocol identical to
# scripts/r5b_chip_runs.sh: one warm discard, then 5 interleaved reps of each
# config, strictly serialized — nothing else may touch the TPU or the host
# core while this runs.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_logs artifacts/r5_serve
L=artifacts/r5_logs

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a $L/runsheet_d.log
  timeout "$t" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a $L/runsheet_d.log
  return $rc
}

CKPT=runs/r5c/checkpoints/best
DATA=data/shapes80_640

run tpu_wait_d 900 python scripts/tpu_recover.py --wait

run serve_warm_discard_c 900 python scripts/serve_bench.py --mode rated \
  --rate 8 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
  --jpeg-dir $DATA/val --output /tmp/r5c_warm_discard.json
for rep in 1 2 3 4 5; do
  run serve_rated8c_rep$rep 900 python scripts/serve_bench.py --mode rated \
    --rate 8 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
    --jpeg-dir $DATA/val --output artifacts/r5_serve/rated8c_rep$rep.json
  run serve_rated12c_rep$rep 900 python scripts/serve_bench.py --mode rated \
    --rate 12 --bucket 2 --seconds 60 --image-size 640 --checkpoint $CKPT \
    --jpeg-dir $DATA/val --output artifacts/r5_serve/rated12c_rep$rep.json
  run serve_overloadc_rep$rep 900 python scripts/serve_bench.py --mode overload \
    --rate 120 --bucket 4 --policy shed_oldest --seconds 45 --image-size 640 \
    --checkpoint $CKPT --jpeg-dir $DATA/val \
    --output artifacts/r5_serve/overloadc_rep$rep.json
done

run serve_medians_c 300 python scripts/serve_median_report.py \
  --config "rated8=artifacts/r5_serve/rated8c_rep*.json" \
  --config "rated12=artifacts/r5_serve/rated12c_rep*.json" \
  --config "overload=artifacts/r5_serve/overloadc_rep*.json" \
  --probe artifacts/tunnel_probe_r05_late.json --frame-shape 640x640x3 \
  --output artifacts/SERVE_MEDIANS_r05c.json

echo "r5c serve reps complete $(date -u)" | tee -a $L/runsheet_d.log
