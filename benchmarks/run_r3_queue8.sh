#!/bin/bash
# Round-3 queue 8: frozen product-path validation, seq stage profile,
# nav sift@ds2 quality middle ground.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q8.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/trainer_render_bench.py --frozen
run python bench.py --seq 24 --seq_profile
run python benchmarks/nav_bench.py --skip_planner --profile_filter --filter_render frozen --filter_opt gn --gn_iters 8 --poi_backend sift --poi_downscale 2
run python benchmarks/nav_bench.py --filter_render frozen --filter_opt gn --gn_iters 8 --replan_iters 100 --poi_backend sift --poi_downscale 2
echo "QUEUE8-DONE" >> "$LOG"
