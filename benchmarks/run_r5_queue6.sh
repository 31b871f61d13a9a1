#!/bin/bash
# Round-5 queue 6 (tail): at-scale quality under the SHIPPED defaults
# (occ_freeze 0.2 + reference lr since round 4 — the recorded 37.67 dB ran
# the retired lr_fast schedule), then the gamma stage attribution (slow
# compiles — deliberately last).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q6.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/quality_check.py --layout cell --levels 4 \
  --level_dim 8 --log2_hashmap 17 --steps 30000 --res 800 --views 50 \
  --scene cluttered
run python benchmarks/profile_render.py --dt_gamma 0.0078125 --stages "march only,A stop,A+B,rounds"
echo "QUEUE6-DONE" >> "$LOG"
