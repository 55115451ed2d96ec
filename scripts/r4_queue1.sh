#!/bin/bash
# Round-4 TPU queue 1: regenerate the stage-1 checkpoints (results/ is wiped
# between rounds). One TPU client at a time. Calibrations run later (queue 2+)
# so they pick up this round's kernel work.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue1.log
echo "[q1] start $(date -u +%H:%M:%S)" > $M

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "[q1] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[q1] $tag rc=$rc — retrying once" >> $M
    sleep 60
    timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
    rc=$?
  fi
  echo "[q1] $tag rc=$rc $(date -u +%H:%M:%S)" >> $M
  return $rc
}

# 0. reference torch-903 init for NeRV (CPU-only, no TPU claim)
run nerv_init 1200 env PALLAS_AXON_POOL_IPS= python scripts/ref_init.py nerv \
  configs/NeRV/Bunny_1280x640_3M.yaml /tmp/nerv_ref903.pth 903

# 1. HNeRV seed-1 regress (best seed from the round-2 sweep: 37.61 dB)
run hnerv_regress 7200 python -u -m neuroquant_tpu.methods.regress \
  --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
  --data_path /root/reference/bunny --vid Bunny \
  --outf sweep/hnerv_s1 --seed 1 --ckpt_freq 100

# 2. NeRV matched-init regress (33.26 dB in rounds 2-3)
run nerv_regress 7200 python -u -m neuroquant_tpu.methods.regress \
  --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
  --data_path /root/reference/bunny --vid Bunny \
  --outf sweep/nerv_ref903 --seed 903 --weight /tmp/nerv_ref903.pth \
  --ckpt_freq 100

# 3. PNeRV regress (36.27 dB in round 3)
run pnerv_regress 9000 python -u -m neuroquant_tpu.methods.regress \
  --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
  --data_path /root/reference/bunny --vid Bunny --outf pnerv_r4 --seed 903 \
  --ckpt_freq 100

echo "[q1] ckpts:" >> $M
find results -name "epoch300.pth" >> $M
echo "[q1] ALL DONE $(date -u +%H:%M:%S)" >> $M
