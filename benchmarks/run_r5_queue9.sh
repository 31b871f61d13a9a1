#!/bin/bash
# Round-5 queue 9: complete the schedule 2x2 at 800^2 (lr_fast x no-freeze
# — the round-2 37.67 ran this cell on round-2 code), then the final
# recorded headline on the shipped defaults.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q9.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/quality_check.py --layout cell --levels 4 \
  --level_dim 8 --log2_hashmap 17 --steps 30000 --res 800 --views 50 \
  --scene cluttered --lr_iters 20000 --occ_freeze_after 0
run python bench.py
echo "QUEUE9-DONE" >> "$LOG"
