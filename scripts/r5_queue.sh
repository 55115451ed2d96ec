#!/bin/bash
# Round-5 TPU job queue (run one at a time — never two jax processes on the
# chip). Each stage logs under /tmp and results/.
set -x
cd /root/repo

HCKPT=results/sweep/hnerv_s1/Bunny_e300_b1_lr0.0005_l2/Encoder_0.31M_Decoder_2.65M_Total_2.66M/epoch300.pth
NCKPT=results/sweep/nerv_ref903/Bunny_e300_b1_lr0.0005_l2/Encoder_0.0M_Decoder_3.08M_Total_3.08M/epoch300.pth

case "$1" in
  bench)
    # validate the boundary-clamped streaming kernels + measure calib it/s
    timeout 2400 python bench.py ;;
  dp16)
    # VERDICT item 3: flagship-shape batch-16 calibration, same-step budget
    timeout 5400 python -m neuroquant_tpu.methods.calibrate_network \
      --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
      --data_path /root/reference/bunny --vid Bunny --outf r5_dp_batch16 \
      --ckpt $HCKPT --precision 6 5 4 5 5 6 6 --hadamard --channel_wise \
      --batch_size 16 --iters_w 21000 --lr 0.003 --warmup 0.2 ;;
  dp16_frames)
    # same-frame budget (21000/8 steps at batch 16)
    timeout 2400 python -m neuroquant_tpu.methods.calibrate_network \
      --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
      --data_path /root/reference/bunny --vid Bunny --outf r5_dp_batch16f \
      --ckpt $HCKPT --precision 6 5 4 5 5 6 6 --hadamard --channel_wise \
      --batch_size 16 --iters_w 2625 --lr 0.003 --warmup 0.2 ;;
  hnerv21k)
    # refresh the headline 21k run on the new kernels
    timeout 2400 python -m neuroquant_tpu.methods.calibrate_network \
      --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
      --data_path /root/reference/bunny --vid Bunny --outf r5_hnerv_calib \
      --ckpt $HCKPT --precision 6 5 4 5 5 6 6 --hadamard --channel_wise \
      --batch_size 2 --iters_w 21000 --lr 0.003 --warmup 0.2 ;;
  nerv21k)
    timeout 2400 python -m neuroquant_tpu.methods.calibrate_network \
      --config configs/NeRV/Bunny_1280x640_3M.yaml --arch nerv \
      --data_path /root/reference/bunny --vid Bunny --outf r5_nerv_calib \
      --ckpt $NCKPT --precision 6 5 5 6 7 6 7 --hadamard --channel_wise \
      --batch_size 2 --iters_w 21000 --lr 0.003 --warmup 0.2 ;;
  block_hd)
    # VERDICT item 6 validation: block-scope recon at flagship 640x1280
    # via the streaming bf16 harvest (--iters_w is per unit)
    timeout 5400 python -m neuroquant_tpu.methods.calibrate_network \
      --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
      --data_path /root/reference/bunny --vid Bunny --outf r5_block_hd \
      --ckpt $HCKPT --precision 6 5 4 5 5 6 6 --hadamard --channel_wise \
      --batch_size 2 --iters_w 3000 --lr 0.003 --warmup 0.2 \
      --scope block --unit_cache stream ;;
  pnerv_sweep)
    timeout 3600 python scripts/tail_layer_bench.py --arch pnerv --bwd \
      --iters 400 ;;
  fps)
    timeout 2400 python scripts/measure_fps.py ;;
  *)
    echo "usage: r5_queue.sh bench|dp16|dp16_frames|hnerv21k|nerv21k|block_hd|pnerv_sweep|fps" ;;
esac
