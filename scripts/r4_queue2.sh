#!/bin/bash
# Round-4 TPU queue 2: measurements + pipelines on the fresh checkpoints,
# with this round's code (corrected FPS measurement, fused prefix, pallas_hvp
# omega, lagrangian search). Waits for queue 1's completion sentinel.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue2.log
echo "[q2] waiting for queue 1..." > $M
for i in $(seq 1 240); do
  grep -q "ALL DONE" /tmp/r4_queue1.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue1.log 2>/dev/null || { echo "[q2] gave up waiting" >> $M; exit 1; }
sleep 20

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "[q2] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[q2] $tag rc=$rc — retrying once" >> $M
    sleep 60
    timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
    rc=$?
  fi
  echo "[q2] $tag rc=$rc $(date -u +%H:%M:%S)" >> $M
  return $rc
}

CK=$(find results -path "*hnerv_s1*" -name "epoch300.pth" | head -1)
NCK=$(find results -path "*nerv_ref903*" -name "epoch300.pth" | head -1)
PCK=$(find results -path "*pnerv_r4*" -name "epoch300.pth" | head -1)
echo "[q2] ckpts: $CK | $NCK | $PCK" >> $M

# a. decode smoke + FPS with the fused prefix (first hardware compile of the
#    prefix plan) — micro uses random params, independent of checkpoints
run micro_hnerv 2400 python scripts/micro_decode.py hnerv
run micro_nerv 1800 python scripts/micro_decode.py nerv

# b. prefix anatomy (XLA prefix cost being replaced) + step breakdown with
#    the fused prefix in the decode_cf path
run prefix_probe 2400 python scripts/prefix_probe.py
run breakdown 3600 python scripts/calib_breakdown.py

# c. driver bench (steady calib it/s + corrected decode FPS)
run bench 3600 python bench.py

# d. omega regression + timing: fused-Pallas HVP vs the XLA packed fallback
if [ -n "$CK" ]; then
  run omega_pallas 2400 python -u -m neuroquant_tpu.methods.bit_assign \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_omega_pallas \
    --ckpt "$CK" --batch_size 2 --channel_wise --init max --mode omega
  run omega_xla 2400 python -u -m neuroquant_tpu.methods.bit_assign \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_omega_xla \
    --ckpt "$CK" --batch_size 2 --channel_wise --init max --mode omega \
    --hvp_impl xla
fi

# e. HNeRV 21k calibration (fused prefix live) + compress
if [ -n "$CK" ]; then
  run hnerv_calib 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_hnerv_calib \
    --ckpt "$CK" --precision 6 5 4 5 5 6 6 --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  ART=$(find results -path "*r4_hnerv_calib*" -name "hnerv_W*.pth" | head -1)
  [ -n "$ART" ] && run hnerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$ART" --data_path /root/reference/bunny
fi

# f. NeRV 21k calibration + compress
if [ -n "$NCK" ]; then
  run nerv_calib 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_nerv_calib \
    --ckpt "$NCK" --precision 6 5 5 6 7 6 7 --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  NART=$(find results -path "*r4_nerv_calib*" -name "nerv_W*.pth" | head -1)
  [ -n "$NART" ] && run nerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$NART" --data_path /root/reference/bunny
fi

# g. official decode FPS on trained checkpoints (corrected measurement)
[ -n "${CK:-}" ] && [ -n "${NCK:-}" ] && [ -n "${ART:-}" ] && \
  run fps 1800 python scripts/measure_fps.py "$CK" "$NCK" "$ART"

# h. PNeRV omega-guided Lagrangian allocation search (batch 2 + remat)
if [ -n "$PCK" ]; then
  run pnerv_search 7200 python -u -m neuroquant_tpu.methods.bit_assign \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_pnerv_search \
    --ckpt "$PCK" --batch_size 2 --channel_wise --init max --mode omega \
    --remat --search lagrangian --target_avg_bits 5.0 --bit_range 3 8
fi

echo "[q2] ALL DONE $(date -u +%H:%M:%S)" >> $M
