#!/bin/bash
# Round-3 queue part 5: post-act_in-fusion refresh.
# Serial TPU jobs: NeRV 21k calib -> official FPS -> calib step anatomy
# -> per-layer tail sweep (fwd+bwd, new cost-model diagnostics).
set -x
cd /root/repo
NCK=$(find results/sweep/nerv_ref903 -name "epoch300.pth" | head -1)
timeout 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
  --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
  --data_path /root/reference/bunny --vid Bunny --outf results/nerv_r3d \
  --ckpt "$NCK" --precision 6 5 5 6 7 6 7 --iters_w 21120 --batch_size 2 \
  --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
  --b_end 2 --warmup 0.2 --lr 0.003 --seed 903 > /tmp/calib21k_nerv_r3d.log 2>&1
echo "nerv21k rc=$?"
HCK=$(find results/sweep/hnerv_s1 -name "epoch300.pth" | head -1)
ART=$(find results/best_r3d -name "hnerv_W*_CW.pth" | head -1)
timeout 1800 python -u scripts/measure_fps.py "$HCK" "$NCK" "$ART" \
  > /tmp/fps_r3d.log 2>&1
echo "fps rc=$?"
timeout 1800 python -u scripts/calib_breakdown.py > /tmp/calib_breakdown_r3d.log 2>&1
echo "breakdown rc=$?"
timeout 3000 python -u scripts/tail_layer_bench.py --arch hnerv --bwd \
  > /tmp/tail_bench_r3d.log 2>&1
echo "tailbench rc=$?"
