#!/bin/bash
# Round-5 queue 5b: clean re-runs of the arms contaminated by the
# double-queue overlap (a stale bash kept reading the rewritten queue-5
# script by file offset), then the queue-6 tail (at-scale quality under
# shipped defaults + gamma stage attribution).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q5b.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python bench.py --frame_phase_a
run python bench.py --frame_phase_a --chunk 16384
run python bench.py --beam 16
run python benchmarks/quality_check.py --layout cell --levels 4 \
  --level_dim 8 --log2_hashmap 17 --steps 30000 --res 800 --views 50 \
  --scene cluttered
run python benchmarks/profile_render.py --dt_gamma 0.0078125 --stages "march only,A stop,A+B,rounds"
echo "QUEUE5B-DONE" >> "$LOG"
