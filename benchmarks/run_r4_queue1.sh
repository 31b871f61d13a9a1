#!/bin/bash
# Round-4 queue 1: harvest every round-3 queued decisive arm (VERDICT item 1).
#   (a) frozen product render number (post +60% fix)
#   (b) train scan_steps / frac-floor / bf16-table arms
#   (c) nav loop Hz with orb@ds2 front-end + gn_fused + one-chunk replans
#   (d) seq stage profile (the ~110 ms/frame unaccounted gap)
#   (e) thresh_freeze drift validation (longest: last)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r4_q1.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/trainer_render_bench.py --frozen
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --scan_steps 4
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --scan_steps 8
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --fracs 0.0625,0.125,0.25,0.5
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --table_dtype bfloat16
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --scan_steps 8 --fracs 0.0625,0.125,0.25,0.5 --table_dtype bfloat16
run python benchmarks/nav_bench.py --skip_planner --profile_filter --filter_render frozen --filter_opt gn --gn_iters 8 --poi_backend orb --poi_downscale 2
run python benchmarks/nav_bench.py --filter_render frozen --filter_opt gn --gn_iters 8 --replan_iters 100 --poi_backend orb --poi_downscale 2
run python bench.py --seq 24 --seq_profile
run python benchmarks/drift_probe.py --variant thresh_freeze
echo "QUEUE1-DONE" >> "$LOG"
