#!/bin/bash
# Variable-rate RD sweep for the BD-rate figure (VERDICT round-2 item 8):
# waits for the best_r3c 21k run to save its artifact, then runs three more
# 21k calibrations on the same hnerv_s1 checkpoint (W3 / W4.96 / W5) and
# entropy-codes each. One TPU client at a time.
#
# NOTE: calibrate_network prepends "results/" to --outf, so an outf of
# "rd_X" lands at results/rd_X — pass outf WITHOUT the results/ prefix and
# search results/ recursively for artifacts.
set -u
CK=$(find results -path "*hnerv_s1*" -name "epoch300.pth" | head -1)
if [ -z "$CK" ]; then echo "[rd] no hnerv_s1 ckpt" > /tmp/rd_sweep.log; exit 1; fi

echo "[rd] waiting for best_r3c artifact (ckpt $CK)..." > /tmp/rd_sweep.log
for i in $(seq 1 300); do
  ART=$(find results -path "*best_r3c*" -name "hnerv_W*.pth" 2>/dev/null | head -1)
  [ -n "${ART}" ] && break
  sleep 60
done
if [ -z "${ART:-}" ]; then echo "[rd] gave up waiting" >> /tmp/rd_sweep.log; exit 1; fi
sleep 30
# entropy-code the W4.79 point too (the sweep's anchor allocation)
timeout 900 python -m neuroquant_tpu.methods.compress --artifact "$ART" \
  --data_path /root/reference/bunny > /tmp/rd_W479_compress.log 2>&1
echo "[rd] best_r3c compress rc=$?" >> /tmp/rd_sweep.log

run_one() {
  local tag=$1; shift
  local prec="$*"
  echo "[rd] $tag: calibrating (${prec})" >> /tmp/rd_sweep.log
  timeout 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
    --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
    --data_path /root/reference/bunny --vid Bunny --outf rd_${tag} \
    --ckpt "$CK" --precision ${prec} --iters_w 21120 --batch_size 2 \
    --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
    --b_end 2 --warmup 0.2 --lr 0.003 --seed 903 \
    > /tmp/rd_${tag}.log 2>&1
  echo "[rd] $tag: calib rc=$?" >> /tmp/rd_sweep.log
  local art=$(find results -path "*rd_${tag}*" -name "hnerv_W*.pth" 2>/dev/null | head -1)
  if [ -n "$art" ]; then
    timeout 900 python -m neuroquant_tpu.methods.compress --artifact "$art" \
      --data_path /root/reference/bunny >> /tmp/rd_${tag}.log 2>&1
    echo "[rd] $tag: compress rc=$? bpp=$(grep -o '"bpp": [0-9.]*' ${art}.nqtb.json 2>/dev/null)" >> /tmp/rd_sweep.log
  else
    echo "[rd] $tag: NO ARTIFACT" >> /tmp/rd_sweep.log
  fi
}

run_one W3333333 3 3 3 3 3 3 3
run_one W4966666 2 3 4 6 4 4 2
run_one W5555555 5 5 5 5 5 5 5
echo "[rd] sweep done" >> /tmp/rd_sweep.log
