#!/bin/bash
# Round-3 queue 2: product-path render parity, training profile + probes,
# nav LM-iteration sweep. ONE chip process at a time.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q2.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/trainer_render_bench.py              # item 1 Done check
run python benchmarks/profile_train.py --levels 4 --level_dim 8 --log2 17 --budget 16384
run python benchmarks/profile_train.py --levels 4 --level_dim 8 --log2 17
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17  # r3 control
run python benchmarks/nav_bench.py --filter_render frozen --filter_opt gn --gn_iters 15
run python benchmarks/nav_bench.py --filter_render frozen --filter_opt gn --gn_iters 8 --replan_iters 100
run python benchmarks/nav_bench.py --filter_render frozen --filter_opt gn --gn_iters 6 --jac_batch 128 --replan_iters 60
echo "QUEUE2-DONE" >> "$LOG"
