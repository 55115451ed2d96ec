#!/bin/bash
# Retry the 21k HNeRV calibration until the TPU pool frees.
# One client at a time; a probe must succeed before the real run launches.
CK=$(find results/sweep/hnerv_s1 -name "epoch300.pth" | head -1)
for i in $(seq 1 40); do
  echo "[retry $i] $(date -u +%H:%M:%S) probing TPU..." >> /tmp/tpu_retry.log
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[retry $i] TPU up, launching 21k" >> /tmp/tpu_retry.log
    timeout 2400 python -u -m neuroquant_tpu.methods.calibrate_network \
      --config configs/HNeRV/Bunny_1280x640_3M.yaml --arch hnerv \
      --data_path /root/reference/bunny --vid Bunny --outf results/best_r3c \
      --ckpt "$CK" --precision 6 5 4 5 5 6 6 --iters_w 21120 --batch_size 2 \
      --hadamard --init max --channel_wise --weight 0.01 --b_start 20 \
      --b_end 2 --warmup 0.2 --lr 0.003 --seed 903 > /tmp/calib21k.log 2>&1
    rc=$?
    echo "[retry $i] 21k exited rc=$rc" >> /tmp/tpu_retry.log
    if [ $rc -eq 0 ]; then exit 0; fi
  fi
  sleep 120
done
echo "gave up" >> /tmp/tpu_retry.log
exit 1
