#!/bin/bash
# Round-4 queue 3: remaining drift dtype arms, re-launched after the EMA
# valid-mask A/B (queue 2 arm 1) reverted the default to decay-all so these
# arms are comparable to the historical control (28.40 -> 23.48).
#   1. fp32_mlp    — bf16 MLP rounding x late lr.
#   2. bf16_tables — quality gate for the +6.6% train-table throughput win.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r4_q3.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/drift_probe.py --variant fp32_mlp
run python benchmarks/drift_probe.py --variant bf16_tables
echo "QUEUE3-DONE" >> "$LOG"
