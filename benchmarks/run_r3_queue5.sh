#!/bin/bash
# Round-3 queue 5: sequence v2 (fused groups + wide bucket), scatter-backward
# probe variants, nav filter with fast front-end.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q5.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py --seq 24 --seq_check
run python bench.py --seq 24 --seq_k 16
run python bench.py --seq 24 --seq_segments 8 --seq_k 16
run python benchmarks/probe_backward.py --n 32768
run python benchmarks/nav_bench.py --skip_planner --profile_filter --filter_render frozen --filter_opt gn --gn_iters 8 --poi_backend orb --poi_downscale 2
echo "QUEUE5-DONE" >> "$LOG"
