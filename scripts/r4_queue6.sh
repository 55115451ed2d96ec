#!/bin/bash
# Round-4 TPU queue 6: UVG calibration-step diagnosis + re-validation with
# the new pins, headline FPS refresh. Chains on queue 5.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue6.log
echo "[q6] waiting for queue 5..." > $M
for i in $(seq 1 720); do
  grep -q "ALL DONE" /tmp/r4_queue5.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue5.log 2>/dev/null || { echo "[q6] gave up" >> $M; exit 1; }
sleep 20

run() {
  local tag=$1 to=$2; shift 2
  echo "[q6] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q6] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run uvg_breakdown 3600 python scripts/calib_breakdown.py \
  --config configs/HNeRV/UVG_1920x960_3M.yaml --frames 8
run serving 2400 python scripts/serving_batch.py

echo "[q6] ALL DONE $(date -u +%H:%M:%S)" >> $M
