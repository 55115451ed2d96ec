#!/bin/bash
# Round-4 queue 11: final UVG steady-rate measure with the epoch-median
# method. Chains on queue 10.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue11.log
echo "[q11] waiting for queue 10..." > $M
for i in $(seq 1 720); do
  grep -q "ALL DONE" /tmp/r4_queue10.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue10.log 2>/dev/null || { echo "[q11] gave up" >> $M; exit 1; }
sleep 20
run() {
  local tag=$1 to=$2; shift 2
  echo "[q11] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q11] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}
run uvg_perf3 5400 python scripts/uvg_perf.py --frames 16
echo "[q11] ALL DONE $(date -u +%H:%M:%S)" >> $M
