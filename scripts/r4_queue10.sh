#!/bin/bash
# Round-4 queue 10 (replaces q8/q9 ordering under the wall clock): PNeRV
# round-loss-weight experiment, UVG step diagnosis, block-recon RD point,
# fixed probes. Chains on queue 7.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue10.log
echo "[q10] waiting for queue 7..." > $M
for i in $(seq 1 720); do
  grep -q "ALL DONE" /tmp/r4_queue7.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue7.log 2>/dev/null || { echo "[q10] gave up" >> $M; exit 1; }
sleep 20
run() {
  local tag=$1 to=$2; shift 2
  echo "[q10] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q10] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

# a. PNeRV 5.37 with the round-loss weight scaled to the 19-layer model:
#    at weight 0.01 phase 2 LOST 0.22 dB vs nearest rounding (35.27->35.05)
PCK=$(find results -path "*pnerv_r4*" -name "epoch300.pth" | head -1)
if [ -n "$PCK" ]; then
  run pnerv_calib55b 3000 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_pnerv_calib55b \
    --ckpt "$PCK" --precision 7 6 5 6 5 4 5 6 6 6 7 7 7 6 6 6 6 6 8 \
    --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.003 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.001 --seed 903
  PART=$(find results -path "*r4_pnerv_calib55b*" -name "pnerv_W*.pth" | head -1)
  [ -n "$PART" ] && run pnerv_compress55b 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$PART" --data_path /root/reference/bunny
fi

# b. UVG calibration-step anatomy (syntax fixed)
run uvg_breakdown2 3600 python scripts/calib_breakdown.py \
  --config configs/HNeRV/UVG_1920x960_3M.yaml --frames 8

# c. block-recon RD point
CK=$(find results -path "*hnerv_s1*" -name "epoch300.pth" | head -1)
if [ -n "$CK" ]; then
  run block_recon 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_block_recon \
    --ckpt "$CK" --precision 6 5 4 5 5 6 6 --iters_w 3000 --batch_size 8 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903 --scope block
  BART=$(find results -path "*r4_block_recon*" -name "hnerv_W*.pth" | head -1)
  [ -n "$BART" ] && run block_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$BART" --data_path /root/reference/bunny
fi

# d. fixed probes
run prefix_probe2 2400 python scripts/prefix_probe.py
run pnerv_stages2 3600 python scripts/pnerv_stages.py

echo "[q10] ALL DONE $(date -u +%H:%M:%S)" >> $M
