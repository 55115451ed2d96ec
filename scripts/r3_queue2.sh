#!/bin/bash
# Round-3 TPU queue, part 2: resumes after the completed HNeRV/NeRV 21k
# calibrations (see r3_queue.sh for part 1). Runs the RD sweep for the
# BD-rate figure, official decode FPS, then the full PNeRV pipeline.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r3_queue.log
echo "[q2] start $(date -u +%H:%M:%S)" >> $M

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "[q2] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r3_${tag}.log 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[q2] $tag rc=$rc — retrying once" >> $M
    sleep 60
    timeout "$to" "$@" > /tmp/r3_${tag}.log 2>&1
    rc=$?
  fi
  echo "[q2] $tag rc=$rc $(date -u +%H:%M:%S)" >> $M
  return $rc
}

CK=$(find results -path "*hnerv_s1*" -name "epoch300.pth" | head -1)
NCK=$(find results -path "*nerv_ref903*" -name "epoch300.pth" | head -1)
ART=$(find results -path "*best_r3c*" -name "hnerv_W*.pth" ! -name "*.nqtb" | head -1)
echo "[q2] CK=$CK NCK=$NCK ART=$ART" >> $M

# 5. RD sweep on the hnerv_s1 checkpoint (BD-rate figure points)
rd_one() {
  local tag=$1; shift
  # skip if this point's bitstream already exists (resume-safety)
  if find results -path "*rd_${tag}/*" -name "*.nqtb" | grep -q .; then
    echo "[q2] rd_${tag} already done, skipping" >> $M
    return 0
  fi
  run rd_${tag} 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf rd_${tag} \
    --ckpt "$CK" --precision "$@" --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  local art=$(find results -path "*rd_${tag}*" -name "hnerv_W*.pth" ! -name "*.nqtb" | head -1)
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
PCK=$(find results -path "*pnerv_r3/*" -name "epoch300.pth" | head -1)
echo "[q2] pnerv ckpt: $PCK" >> $M
if [ -n "$PCK" ]; then
  NPREC=$(python - <<'EOF'
import sys
sys.path.insert(0, '.')
from neuroquant_tpu.config import get_config
from neuroquant_tpu.quantization import make_spec
cfg = get_config('configs/PNeRV/Bunny_1280x640_3M.yaml')
spec = make_spec('pnerv', cfg, channel_wise=True, scale_method='max', hadamard=True)
print(' '.join(['5'] * len(spec.layer_names)))
EOF
)
  echo "[q2] pnerv precision: $NPREC" >> $M
  run pnerv_calib 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf pnerv_r3_calib \
    --ckpt "$PCK" --precision $NPREC --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  PART=$(find results -path "*pnerv_r3_calib*" -name "pnerv_W*.pth" ! -name "*.nqtb" | head -1)
  [ -n "$PART" ] && run pnerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$PART" --data_path /root/reference/bunny
fi
run pnerv_fps 1800 python scripts/micro_decode.py pnerv

echo "[q2] ALL DONE $(date -u +%H:%M:%S)" >> $M
