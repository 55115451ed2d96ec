#!/bin/bash
# Round-4 queue 8: fixed probes re-run (prefix + PNeRV stage anatomy).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/r4_queue8.log
echo "[q8] waiting for queue 7..." > $M
for i in $(seq 1 720); do
  grep -q "ALL DONE" /tmp/r4_queue7.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" /tmp/r4_queue7.log 2>/dev/null || { echo "[q8] gave up" >> $M; exit 1; }
sleep 20
run() {
  local tag=$1 to=$2; shift 2
  echo "[q8] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/r4_${tag}.log 2>&1
  echo "[q8] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}
run prefix_probe2 2400 python scripts/prefix_probe.py
run pnerv_stages2 3600 python scripts/pnerv_stages.py
echo "[q8] ALL DONE $(date -u +%H:%M:%S)" >> $M
