#!/bin/bash
# PNeRV stage-2 omega allocation + stage-3 calibration of the winner.
# Three 19-layer candidates around avg-5 bits (no reference experiment
# exists for PNeRV — the reference's PNeRV path is dead code):
#   c1 uniform 5, c2 small-layers-high / fat-dec-low (avg 4.81),
#   c3 fat-dec-high / bsm-low (avg 5.25).
set -x
cd /root/repo
CK=$(find results/pnerv_r3 -name "epoch300.pth" | head -1)
C1="5,5,5,5,5,5,5,5,5,5,5,5,5,5,5,5,5,5,5"
C2="7,7,4,4,4,4,6,6,6,6,7,7,7,7,6,6,6,6,8"
C3="4,4,6,6,6,6,4,4,4,4,4,4,4,4,4,4,4,4,4"
timeout 2400 python -u -m neuroquant_tpu.methods.bit_assign \
  --config configs/PNeRV/Bunny_1280x640_3M.yaml --arch pnerv \
  --data_path /root/reference/bunny --vid Bunny --outf results/pnerv_omega \
  --ckpt "$CK" --candidates "$C1;$C2;$C3" --batch_size 1 \
  --hadamard --channel_wise --init max --mode omega > /tmp/pnerv_omega.log 2>&1
echo "omega rc=$?"
WIN=$(grep -oP "Best Candidate.*" /tmp/pnerv_omega.log | tail -1)
echo "winner: $WIN"
BITS=$(grep -aoP "best bits: \K[0-9 ]+" /tmp/pnerv_omega.log | tail -1)
if [ -z "$BITS" ]; then
  # fall back to parsing the candidate list from the log
  BITS=$(grep -aoP "Best Candidate: candidate[0-9]" /tmp/pnerv_omega.log | tail -1)
fi
echo "bits=$BITS"
