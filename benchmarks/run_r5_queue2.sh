#!/bin/bash
# Round-5 queue 2: the render-attack aiming shots (VERDICT items 1, 5, 6).
# 1-2. exact intra-march attribution (stop_after hooks) at beam 8 and 1 —
#      the round-4 profile ran beam 1 + a hand-mirrored unbeamed phase A,
#      overstating phase A's share of the beamed flagship.
# 3-4. beam-16 cliff: march-level sample-count sweep on chip (the CPU sweep
#      shows NO death: beam16 keeps ~100.2% of beam1 samples over the full
#      frame) + the guarded bench repro.
# 5-6. gamma attribution: stage split at dt_gamma=1/128 vs 0 (unplanned
#      ladders both sides).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q2.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/profile_render.py --t_a0 97 --beam 8
run python benchmarks/profile_render.py --t_a0 97
run python benchmarks/probe_beam16.py
run python bench.py --beam 16
run python benchmarks/profile_render.py --dt_gamma 0.0078125 --stages "march,rounds"
run python benchmarks/profile_render.py --dt_gamma 0.0078125 --beam 8 --stages "march,rounds"
run python benchmarks/probe_gather.py
echo "QUEUE2-DONE" >> "$LOG"
