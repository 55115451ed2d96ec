#!/bin/bash
# Round-4 queue 9: BRECQ block-reconstruction RD point on Bunny (contrast
# with network-wise calibration; VERDICT r3 item 8).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue9.log
echo "[q9] waiting for queue 8..." > $M
for i in $(seq 1 720); do
  grep -q "ALL DONE" /tmp/r4_queue8.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue8.log 2>/dev/null || { echo "[q9] gave up" >> $M; exit 1; }
sleep 20
run() {
  local tag=$1 to=$2; shift 2
  echo "[q9] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q9] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}
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
echo "[q9] ALL DONE $(date -u +%H:%M:%S)" >> $M
