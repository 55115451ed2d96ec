#!/bin/bash
# Round-3 TPU validation queue (one TPU client at a time; results/ was
# wiped between sessions, so stage-1 checkpoints are regenerated first).
#
# Order: ref-init NeRV -> HNeRV s1 regress -> HNeRV 21k calib (validates the
# pre-gathered-batch scan quality on TPU) + compress -> NeRV matched-init
# regress -> NeRV 21k calib + compress -> RD sweep (W3/W4.96/W5/W6) ->
# decode FPS on trained ckpts -> PNeRV full pipeline.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r3_queue.log
echo "[q] start $(date -u +%H:%M:%S)" > $M

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "[q] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r3_${tag}.log 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[q] $tag rc=$rc — retrying once" >> $M
    sleep 60
    timeout "$to" "$@" > /tmp/r3_${tag}.log 2>&1
    rc=$?
  fi
  echo "[q] $tag rc=$rc $(date -u +%H:%M:%S)" >> $M
  return $rc
}

# 0. reference torch-903 init for NeRV (CPU, no TPU)
run nerv_init 1200 python scripts/ref_init.py nerv \
  configs/NeRV/Bunny_1280x640_3M.yaml /tmp/nerv_ref903.pth 903

# 1. HNeRV seed-1 regress (best seed from the round-2 sweep: 37.61 dB)
run hnerv_regress 7200 python -u -m neuroquant_tpu.methods.regress \
  --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
  --data_path /root/reference/bunny --vid Bunny \
  --outf sweep/hnerv_s1 --seed 1 --ckpt_freq 100

CK=$(find results -path "*hnerv_s1*" -name "epoch300.pth" | head -1)
echo "[q] hnerv ckpt: $CK" >> $M

# 2. HNeRV 21k W4.79 calibration (shipping defaults: fused tail +
#    pre-gathered epoch batches) — the queued TPU quality validation
if [ -n "$CK" ]; then
  run hnerv_calib 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf best_r3c \
    --ckpt "$CK" --precision 6 5 4 5 5 6 6 --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  ART=$(find results -path "*best_r3c*" -name "hnerv_W*.pth" | head -1)
  [ -n "$ART" ] && run hnerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$ART" --data_path /root/reference/bunny
fi

# 3. NeRV matched-init regress (33.26 dB in round 2)
run nerv_regress 7200 python -u -m neuroquant_tpu.methods.regress \
  --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
  --data_path /root/reference/bunny --vid Bunny \
  --outf sweep/nerv_ref903 --seed 903 --weight /tmp/nerv_ref903.pth \
  --ckpt_freq 100

NCK=$(find results -path "*nerv_ref903*" -name "epoch300.pth" | head -1)
echo "[q] nerv ckpt: $NCK" >> $M

# 4. NeRV 21k W5.12 calibration (omega winner) + compress
if [ -n "$NCK" ]; then
  run nerv_calib 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
    --data_path /root/reference/bunny --vid Bunny --outf nerv_r3 \
    --ckpt "$NCK" --precision 6 5 5 6 7 6 7 --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  NART=$(find results -path "*nerv_r3*" -name "nerv_W*.pth" | head -1)
  [ -n "$NART" ] && run nerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$NART" --data_path /root/reference/bunny
fi

# 5. RD sweep on the hnerv_s1 checkpoint (BD-rate figure points)
rd_one() {
  local tag=$1; shift
  run rd_${tag} 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf rd_${tag} \
    --ckpt "$CK" --precision "$@" --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  local art=$(find results -path "*rd_${tag}*" -name "hnerv_W*.pth" | head -1)
  [ -n "$art" ] && run rdc_${tag} 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$art" --data_path /root/reference/bunny
}
if [ -n "$CK" ]; then
  rd_one W3 3 3 3 3 3 3 3
  rd_one W496 2 3 4 6 4 4 2
  rd_one W4 4 4 4 4 4 4 4
  rd_one W5 5 5 5 5 5 5 5
  rd_one W6 6 6 6 6 6 6 6
fi

# 6. official decode FPS on the trained checkpoints
[ -n "${CK:-}" ] && [ -n "${NCK:-}" ] && [ -n "${ART:-}" ] && \
  run fps 1800 python scripts/measure_fps.py "$CK" "$NCK" "$ART"

# 7. PNeRV full pipeline: regress 300ep -> 21k W5 calib -> compress -> FPS
run pnerv_regress 9000 python -u -m neuroquant_tpu.methods.regress \
  --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
  --data_path /root/reference/bunny --vid Bunny --outf pnerv_r3 --seed 903 \
  --ckpt_freq 100
PCK=$(find results -path "*pnerv_r3*" -name "epoch300.pth" | head -1)
echo "[q] pnerv ckpt: $PCK" >> $M
if [ -n "$PCK" ]; then
  NPREC=$(python - "$PCK" <<'EOF'
import sys, subprocess
# count quant layers for pnerv from the spec
sys.path.insert(0, '.')
from neuroquant_tpu.config import get_config
from neuroquant_tpu.quantization import make_spec
cfg = get_config('configs/PNeRV/Bunny_1280x640_3M.yaml')
spec = make_spec('pnerv', cfg, channel_wise=True, scale_method='max', hadamard=True)
print(' '.join(['5'] * len(spec.layer_names)))
EOF
)
  echo "[q] pnerv precision: $NPREC" >> $M
  run pnerv_calib 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf pnerv_r3_calib \
    --ckpt "$PCK" --precision $NPREC --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  PART=$(find results -path "*pnerv_r3_calib*" -name "pnerv_W*.pth" | head -1)
  [ -n "$PART" ] && run pnerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$PART" --data_path /root/reference/bunny
fi
run pnerv_fps 1800 python scripts/micro_decode.py pnerv

echo "[q] ALL DONE $(date -u +%H:%M:%S)" >> $M
