#!/bin/bash
# Round-4 queue 7: NeRV-UVG pins validation + uvg_perf re-run after the
# head-pin fix, + the UVG calibration re-measure. Chains on queue 6.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue7.log
echo "[q7] waiting for queue 6..." > $M
for i in $(seq 1 720); do
  grep -q "ALL DONE" /tmp/r4_queue6.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue6.log 2>/dev/null || { echo "[q7] gave up" >> $M; exit 1; }
sleep 20
run() {
  local tag=$1 to=$2; shift 2
  echo "[q7] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q7] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}
run uvg_perf2 5400 python scripts/uvg_perf.py
echo "[q7] ALL DONE $(date -u +%H:%M:%S)" >> $M
