#!/bin/bash
# Round-3 queue 4: sequence-render headline (fixed partial-tile padding),
# product-gap attribution A/Bs, nav filter breakdown.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q4.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py --seq 24 --seq_check
run python bench.py --seq 24 --seq_t_a0 16
run python bench.py --seq 24 --seq_segments 8
run python bench.py --depth_out
run python bench.py --nested_jit
run python bench.py --args_mode
run python bench.py --args_mode --nested_jit --depth_out
run python benchmarks/nav_bench.py --skip_planner --profile_filter --filter_render frozen --filter_opt gn --gn_iters 8
echo "QUEUE4-DONE" >> "$LOG"
