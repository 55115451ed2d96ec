#!/bin/bash
# Round-4 TPU queue 4: PNeRV quality chain (stage anatomy, 21k calibration
# of the lagrangian-search winner, entropy coding, decode FPS). Chains
# behind queue 3.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue4.log
echo "[q4] waiting for queue 3..." > $M
for i in $(seq 1 480); do
  grep -q "ALL DONE" /tmp/r4_queue3.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue3.log 2>/dev/null || { echo "[q4] gave up" >> $M; exit 1; }
sleep 20

run() {
  local tag=$1 to=$2; shift 2
  echo "[q4] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q4] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run pnerv_stages 3600 python scripts/pnerv_stages.py

PCK=$(find results -path "*pnerv_r4*" -name "epoch300.pth" | head -1)
# winner from the queue-2 lagrangian search log
WIN=$(python - <<'PY'
import re
try:
    txt = open("/tmp/r4_pnerv_search.log").read()
    m = re.findall(r"Bit Configuration: \[([0-9, ]+)\]", txt)
    print(m[-1].replace(",", " ") if m else "")
except OSError:
    print("")
PY
)
echo "[q4] pnerv ckpt: $PCK winner: $WIN" >> $M
if [ -n "$PCK" ] && [ -n "$WIN" ]; then
  run pnerv_calib 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
    --data_path /root/reference/bunny --vid Bunny --outf r4_pnerv_calib \
    --ckpt "$PCK" --precision $WIN --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903
  PART=$(find results -path "*r4_pnerv_calib*" -name "pnerv_W*.pth" | head -1)
  [ -n "$PART" ] && run pnerv_compress 900 python -m neuroquant_tpu.methods.compress \
    --artifact "$PART" --data_path /root/reference/bunny
fi
run pnerv_micro 2400 python scripts/micro_decode.py pnerv

echo "[q4] ALL DONE $(date -u +%H:%M:%S)" >> $M
