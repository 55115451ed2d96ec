#!/bin/bash
# Round-4 TPU queue 3: UVG-geometry kernel sweeps (fwd + bwd) + UVG perf
# re-measure. Chains behind queue 2.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue3.log
echo "[q3] waiting for queue 2..." > $M
for i in $(seq 1 360); do
  grep -q "ALL DONE" /tmp/r4_queue2.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue2.log 2>/dev/null || { echo "[q3] gave up" >> $M; exit 1; }
sleep 20

run() {
  local tag=$1 to=$2; shift 2
  echo "[q3] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q3] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run uvg_sweep_h_fwd 5400 python scripts/tail_layer_bench.py --arch hnerv_uvg --iters 400
run uvg_sweep_h_bwd 7200 python scripts/tail_layer_bench.py --arch hnerv_uvg --iters 400 --bwd
run uvg_sweep_n_fwd 3600 python scripts/tail_layer_bench.py --arch nerv_uvg --iters 400
run uvg_sweep_n_bwd 5400 python scripts/tail_layer_bench.py --arch nerv_uvg --iters 400 --bwd
run uvg_perf 5400 python scripts/uvg_perf.py

echo "[q3] ALL DONE $(date -u +%H:%M:%S)" >> $M
