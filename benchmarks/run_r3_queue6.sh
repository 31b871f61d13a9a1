#!/bin/bash
# Round-3 queue 6: sequence v3 sweep, args-mode attribution split,
# drift control, prepass final regime A/B, nav orb loop.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q6.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py --seq 24 --seq_check
run python bench.py --seq 24 --seq_t_a0 32
run python bench.py --seq 24 --seq_t_a0 48
run python bench.py --seq 24 --seq_k 16 --seq_segments 8
run python bench.py --args_mode --args_split params
run python bench.py --args_mode --args_split occ
run python benchmarks/drift_probe.py --variant control
run python bench.py --prepass --yaw 25
run python bench.py --yaw 25
run python benchmarks/nav_bench.py --filter_render frozen --filter_opt gn --gn_iters 8 --replan_iters 100 --poi_backend orb --poi_downscale 2
echo "QUEUE6-DONE" >> "$LOG"
