#!/bin/bash
# Full PNeRV-Bunny pipeline on TPU (VERDICT round-2 item 7: PNeRV perf
# story): 300-epoch regress -> 21k W5 network-wise calibration -> entropy
# coding -> decode-FPS microbench. Chains behind scripts/rd_sweep.sh (one
# TPU client at a time) by waiting for its completion sentinel.
#
# NOTE: the CLIs prepend "results/" to --outf — pass outf without the
# prefix and search results/ recursively.
set -u
echo "[pnerv] waiting for rd sweep..." > /tmp/pnerv_pipe.log
for i in $(seq 1 400); do
  grep -q "\[rd\] sweep done" /tmp/rd_sweep.log 2>/dev/null && break
  sleep 60
done
grep -q "\[rd\] sweep done" /tmp/rd_sweep.log 2>/dev/null || { echo "[pnerv] gave up" >> /tmp/pnerv_pipe.log; exit 1; }
sleep 20

echo "[pnerv] regress 300 epochs" >> /tmp/pnerv_pipe.log
timeout 7200 python -u -m neuroquant_tpu.methods.regress \
  --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
  --data_path /root/reference/bunny --vid Bunny --outf pnerv_r3 \
  --seed 903 > /tmp/pnerv_regress.log 2>&1
echo "[pnerv] regress rc=$?" >> /tmp/pnerv_pipe.log

CK=$(find results -path "*pnerv_r3*" -name "epoch300.pth" 2>/dev/null | head -1)
if [ -z "$CK" ]; then echo "[pnerv] no ckpt" >> /tmp/pnerv_pipe.log; exit 1; fi

PREC="5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5"   # 19 quant layers, W5 flat
echo "[pnerv] calibrate 21k W5 (ckpt $CK)" >> /tmp/pnerv_pipe.log
timeout 3600 python -u -m neuroquant_tpu.methods.calibrate_network \
  --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
  --data_path /root/reference/bunny --vid Bunny --outf pnerv_r3_calib \
  --ckpt "$CK" --precision $PREC --iters_w 21120 --batch_size 2 \
  --hadamard --init max --channel_wise --weight 0.01 --b_start 20 --b_end 2 \
  --warmup 0.2 --lr 0.003 --seed 903 > /tmp/pnerv_calib.log 2>&1
echo "[pnerv] calib rc=$?" >> /tmp/pnerv_pipe.log

ART=$(find results -path "*pnerv_r3_calib*" -name "pnerv_W*.pth" 2>/dev/null | head -1)
if [ -n "$ART" ]; then
  timeout 900 python -m neuroquant_tpu.methods.compress --artifact "$ART" \
    --data_path /root/reference/bunny >> /tmp/pnerv_calib.log 2>&1
  echo "[pnerv] compress rc=$?" >> /tmp/pnerv_pipe.log
else
  echo "[pnerv] NO CALIB ARTIFACT" >> /tmp/pnerv_pipe.log
fi

echo "[pnerv] decode microbench" >> /tmp/pnerv_pipe.log
timeout 1800 python scripts/micro_decode.py pnerv > /tmp/pnerv_decode.log 2>&1
echo "[pnerv] micro rc=$?; done" >> /tmp/pnerv_pipe.log
