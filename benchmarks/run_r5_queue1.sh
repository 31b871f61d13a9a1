#!/bin/bash
# Round-5 queue 1: the occ_freeze replacement A/B (VERDICT item 3).
# Round-4 diagnosis: the 30k reference-schedule collapse is occupancy
# GROWTH (max-EMA accretes junk: mean_density 18x, occ_frac rises), so the
# two named fix candidates run against the reference schedule with NO
# freeze and the reference lr horizon. Bar: final >= 28 dB (control
# collapses to ~23.5-24).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q1.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/drift_probe.py --variant growth_clamp
run python benchmarks/drift_probe.py --variant toward_query
run python benchmarks/drift_probe.py --variant clamp_and_toward
echo "QUEUE1-DONE" >> "$LOG"
