#!/bin/bash
# Post-sweep TPU job chain (run sequentially on the single chip):
#  1. matched-init 300-epoch runs from the reference's exact torch-903 draw
#  2. omega bit assignment + 21k-iter network calibration + entropy coding
#     on the best-seed HNeRV checkpoint (full pipeline at round-2 speed)
#  3. UVG 1920x960 smoke through both UVG configs
#  4. bench.py sanity (the driver's own metric)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}

echo "=== 1a. ref-init HNeRV 300ep $(date) ==="
python scripts/ref_init.py hnerv configs/HNeRV/Bunny_1280x640_3M.yaml /tmp/refinit/hnerv903.pth
python -m neuroquant_tpu.methods.regress \
  --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
  --data_path /root/reference/bunny --vid Bunny --outf sweep/hnerv_refinit \
  --weight /tmp/refinit/hnerv903.pth --ckpt_freq 100 2>&1 | tail -2

echo "=== 1b. ref-init NeRV 300ep $(date) ==="
python scripts/ref_init.py nerv configs/NeRV/Bunny_1280x640_3M.yaml /tmp/refinit/nerv903.pth
python -m neuroquant_tpu.methods.regress \
  --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
  --data_path /root/reference/bunny --vid Bunny --outf sweep/nerv_refinit \
  --weight /tmp/refinit/nerv903.pth --ckpt_freq 100 2>&1 | tail -2

echo "=== 2. full pipeline on best HNeRV ckpt $(date) ==="
BEST=$(for d in results/sweep/hnerv_s*/ results/sweep/hnerv_refinit/; do
  LOG=$(find "$d" -name "*.log" 2>/dev/null | head -1)
  [ -n "$LOG" ] && echo "$(grep -o 'pred_seen_psnr: [0-9.]*' "$LOG" | tail -1 | cut -d' ' -f2) $d"
done | sort -rn | head -1 | cut -d' ' -f2)
echo "best run: $BEST"
CKPT=$(find "$BEST" -name "epoch300.pth" | head -1)
python -m neuroquant_tpu.methods.bit_assign \
  --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
  --data_path /root/reference/bunny --vid Bunny --outf best_r2 \
  --ckpt "$CKPT" --batch_size 2 --channel_wise --mode omega 2>&1 | tail -3
python -m neuroquant_tpu.methods.calibrate_network \
  --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
  --data_path /root/reference/bunny --vid Bunny --outf best_r2 \
  --ckpt "$CKPT" --precision 6 5 4 5 5 6 6 --channel_wise --hadamard \
  --batch_size 2 --iters_w 21000 --lr 0.003 --warmup 0.2 2>&1 | tail -3
ART=$(find results/best_r2 -name "hnerv_W*.pth" | head -1)
python -m neuroquant_tpu.methods.compress \
  --artifact "$ART" --data_path /root/reference/bunny 2>&1 | tail -5

echo "=== 3. UVG smoke $(date) ==="
python scripts/uvg_smoke.py 10 480 2>&1 | grep "uvg_smoke\|Error" | tail -8

echo "=== 4. bench.py $(date) ==="
python bench.py

echo "=== post_sweep done $(date) ==="
