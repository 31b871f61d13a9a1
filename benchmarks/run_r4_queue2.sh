#!/bin/bash
# Round-4 queue 2: drift root-cause + dtype quality gates (verdict items 3/4).
#   1. control     — now INCLUDES the occupancy EMA valid-mask fix (667dcd2);
#                    if the leak was the root cause, the 9k->12k collapse
#                    (28.40 -> 24.63) disappears.
#   2. fp32_mlp    — bf16 MLP rounding x late lr suspect (only if 1 fails).
#   3. bf16_tables — quality gate for the +6.6% train-table throughput win.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r4_q2.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/drift_probe.py --variant control
run python benchmarks/drift_probe.py --variant fp32_mlp
run python benchmarks/drift_probe.py --variant bf16_tables
echo "QUEUE2-DONE" >> "$LOG"
