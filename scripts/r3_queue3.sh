#!/bin/bash
# Round-3 TPU queue, part 3: waits for part 2 (PID file /tmp/r3q2.pid) to
# finish, then runs the decode-MFU measurement set and a bench sanity run.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r3_queue.log

if [ -f /tmp/r3q2.pid ]; then
  P=$(cat /tmp/r3q2.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
echo "[q3] start $(date -u +%H:%M:%S)" >> $M

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "[q3] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r3_${tag}.log 2>&1
  echo "[q3] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run stages_hnerv 1800 python scripts/decode_stages.py --arch hnerv
run stages_nerv 1800 python scripts/decode_stages.py --arch nerv
run tailbench_hnerv 3600 python scripts/tail_layer_bench.py --arch hnerv --bwd
run tailbench_nerv 2400 python scripts/tail_layer_bench.py --arch nerv
run bench_sanity 3600 python bench.py

echo "[q3] ALL DONE $(date -u +%H:%M:%S)" >> $M
