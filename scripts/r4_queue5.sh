#!/bin/bash
# Round-4 TPU queue 5: Bunny-geometry pupatches sweeps, prefix-geometry
# sweeps, re-bench with the tm=512 prefix, official FPS. Chains on queue 4.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue5.log
echo "[q5] waiting for queue 4..." > $M
for i in $(seq 1 600); do
  grep -q "ALL DONE" /tmp/r4_queue4.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue4.log 2>/dev/null || { echo "[q5] gave up" >> $M; exit 1; }
sleep 20

run() {
  local tag=$1 to=$2; shift 2
  echo "[q5] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q5] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run sweep_h_pu 3600 python scripts/tail_layer_bench.py --arch hnerv --modes pupatches --bwd --iters 400
run sweep_n_pu 3600 python scripts/tail_layer_bench.py --arch nerv --modes pupatches --bwd --iters 400
run sweep_hpre 3600 python scripts/tail_layer_bench.py --arch hnerv_prefix --bwd --iters 400
run sweep_npre 3600 python scripts/tail_layer_bench.py --arch nerv_prefix --bwd --iters 400
run bench2 2400 python bench.py

CK=$(find results -path "*hnerv_s1*" -name "epoch300.pth" | head -1)
NCK=$(find results -path "*nerv_ref903*" -name "epoch300.pth" | head -1)
ART=$(find results -path "*r4_hnerv_calib*" -name "hnerv_W*.pth" | head -1)
[ -n "$CK" ] && [ -n "$NCK" ] && [ -n "$ART" ] && \
  run fps2 1800 python scripts/measure_fps.py "$CK" "$NCK" "$ART"

echo "[q5] ALL DONE $(date -u +%H:%M:%S)" >> $M
