#!/bin/bash
# Post-upatches measurement refresh (run after scripts/r3_queue.sh):
# decode stage anatomy, serving-batch decode table, and the driver bench —
# the numbers RESULTS.md's round-3 roll-up quotes.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
M=/tmp/post_up.log
echo "[pu] start $(date -u +%H:%M:%S)" > $M

run() {
  local tag=$1 to=$2; shift 2
  echo "[pu] $tag start $(date -u +%H:%M:%S)" >> $M
  timeout "$to" "$@" > /tmp/pu_${tag}.log 2>&1
  echo "[pu] $tag rc=$? $(date -u +%H:%M:%S)" >> $M
}

run stages_h 1200 python scripts/decode_stages.py --arch hnerv
run stages_n 1200 python scripts/decode_stages.py --arch nerv
run serving 1800 python scripts/serving_batch.py
run bench 1800 python bench.py
echo "[pu] ALL DONE $(date -u +%H:%M:%S)" >> $M
