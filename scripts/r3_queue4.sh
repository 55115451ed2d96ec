#!/bin/bash
# Round-3 TPU queue, part 4: waits for part 3, then runs the pack-start
# sweep under the fused kernels and the PNeRV calibration microbenchmark.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r3_queue.log

if [ -f /tmp/r3q3.pid ]; then
  P=$(cat /tmp/r3q3.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
echo "[q4] start $(date -u +%H:%M:%S)" >> $M

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "[q4] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r3_${tag}.log 2>&1
  echo "[q4] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run tsweep 3600 python scripts/micro_decode.py tsweep
run pnerv_calib_micro 3600 python scripts/micro_decode.py pnerv_calib

echo "[q4] ALL DONE $(date -u +%H:%M:%S)" >> $M
