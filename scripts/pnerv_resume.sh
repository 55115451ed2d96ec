#!/bin/bash
# Re-run the tail of scripts/r3_queue.sh that was interrupted (PNeRV 21k W5
# calibration -> compress -> micro decode), then the post-upatches
# measurement refresh. Single TPU process at a time.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/pnerv_resume.log
echo "[pr] start $(date -u +%H:%M:%S)" > $M

run() {
  local tag=$1 to=$2; shift 2
  echo "[pr] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/pr_${tag}.log 2>&1
  echo "[pr] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

PCK=$(find results -path "*pnerv_r3*" -name "epoch300.pth" | head -1)
echo "[pr] pnerv ckpt: $PCK" >> $M
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
  echo "[pr] pnerv precision: $NPREC" >> $M
  run pnerv_calib 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf pnerv_r3_calib \
    --ckpt "$PCK" --precision $NPREC --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  PART=$(find results -path "*pnerv_r3_calib*" -name "pnerv_W*.pth" | head -1)
  echo "[pr] pnerv artifact: $PART" >> $M
  [ -n "$PART" ] && run pnerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$PART" --data_path /root/reference/bunny
fi
run pnerv_fps 1800 python scripts/micro_decode.py pnerv

bash scripts/post_upatches.sh
echo "[pr] ALL DONE $(date -u +%H:%M:%S)" >> $M
