#!/bin/bash
# Round-4 TPU queue 6 (v2): PNeRV 5.37-avg allocation calibration (the bpp
# headroom play: W5's 0.1213 bpp vs the 0.13 budget), then the UVG
# calibration-step diagnosis + serving batch. Chains on queue 5.
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

PCK=$(find results -path "*pnerv_r4*" -name "epoch300.pth" | head -1)
if [ -n "$PCK" ]; then
  run pnerv_calib55 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_pnerv_calib55 \
    --ckpt "$PCK" --precision 7 6 5 6 5 4 5 6 6 6 7 7 7 6 6 6 6 6 8 \
    --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  PART=$(find results -path "*r4_pnerv_calib55*" -name "pnerv_W*.pth" | head -1)
  [ -n "$PART" ] && run pnerv_compress55 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$PART" --data_path /root/reference/bunny
fi

run uvg_breakdown 3600 python scripts/calib_breakdown.py \
  --config configs/HNeRV/UVG_1920x960_3M.yaml --frames 8
run serving 2400 python scripts/serving_batch.py

echo "[q6] ALL DONE $(date -u +%H:%M:%S)" >> $M
