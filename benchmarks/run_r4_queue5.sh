#!/bin/bash
# Round-4 queue 5: occupancy-hysteresis drift arm (the churn hypothesis) —
# run after queue 4. occ_freeze@6k holds >= 28 dB, ray_hash/thresh_freeze/
# ema_sampled all failed; boundary-cell bitfield flicker is the remaining
# sample-lattice noise source. hysteresis=0.5 keeps carving alive but sticky.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r4_q5.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/drift_probe.py --variant hysteresis
# training attribution: train_bench now times the occupancy partial sweep
# (Trainer.train pays it every 16 steps; the steps/s number never included
# it) — steps_per_sec_with_occ is the honest Trainer.train-equivalent rate
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17 --table_dtype bfloat16
echo "QUEUE5-DONE" >> "$LOG"
