#!/bin/bash
# Multi-seed stage-1 sweep (VERDICT round-1 item 5): quantify the init-draw
# variance separating our single-seed runs from the reference's single
# logged draw (HNeRV 37.57, NeRV 33.25 — results/*_Bunny_1280x640 logs).
# Runs sequentially (one TPU chip). ~8 x 300-epoch runs.
set -u
cd "$(dirname "$0")/.."
# append (don't clobber) PYTHONPATH: the axon TPU plugin registers via a
# sitecustomize on the ambient PYTHONPATH
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
mkdir -p results/sweep
for arch in hnerv nerv; do
  if [ "$arch" = hnerv ]; then CFG=configs/HNeRV/Bunny_1280x640_3M.yaml; else CFG=configs/NeRV/Bunny_1280x640_3M.yaml; fi
  for seed in 903 1 2 3; do
    echo "=== $arch seed $seed $(date) ==="
    python -m neuroquant_tpu.methods.regress \
      --config "$CFG" --arch "$arch" \
      --data_path /root/reference/bunny --vid Bunny \
      --outf "sweep/${arch}_s${seed}" --seed "$seed" --ckpt_freq 100 \
      2>&1 | tail -3
  done
done
echo "=== sweep done $(date) ==="
