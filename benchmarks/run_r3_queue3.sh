#!/bin/bash
# Round-3 queue 3: frame-coherent sequence render (headline attempt),
# product-path gap attribution, drift-probe ray_hash arm (verdict item 3).
# ONE chip process at a time.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q3.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py --seq 24 --seq_check
run python bench.py --seq 24 --seq_t_a0 16
run python bench.py --seq 24 --seq_segments 8
run python benchmarks/trainer_render_bench.py --inner
run python benchmarks/drift_probe.py --variant ray_hash
echo "QUEUE3-DONE" >> "$LOG"
