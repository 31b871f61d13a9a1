#!/bin/bash
# Round-5 queue 8: (a) locate the 3 dB between the shipped-defaults 34.63
# and the recorded 37.67 at 800^2 (lr horizon? the freeze? both changed
# since round 2); (b) gamma endgame — the gather-free ladder select +
# beam 8 against the 3.2x phase-A attribution.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q8.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/quality_check.py --layout cell --levels 4 \
  --level_dim 8 --log2_hashmap 17 --steps 30000 --res 800 --views 50 \
  --scene cluttered --lr_iters 20000
run python benchmarks/quality_check.py --layout cell --levels 4 \
  --level_dim 8 --log2_hashmap 17 --steps 30000 --res 800 --views 50 \
  --scene cluttered --occ_freeze_after 0
run python bench.py --dt_gamma 0.0078125
run python benchmarks/profile_render.py --dt_gamma 0.0078125 --beam 8 --stages "march only,A stop,rounds"
echo "QUEUE8-DONE" >> "$LOG"
