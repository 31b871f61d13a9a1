#!/bin/bash
# Round-3 queue 7: training-throughput levers (scan-steps dispatch fusion,
# budget-frac floor, bf16 table compute).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q7.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --scan_steps 4
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --scan_steps 8
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --fracs 0.0625,0.125,0.25,0.5
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --table_dtype bfloat16
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --scan_steps 8 --fracs 0.0625,0.125,0.25,0.5 --table_dtype bfloat16
echo "QUEUE7-DONE" >> "$LOG"
