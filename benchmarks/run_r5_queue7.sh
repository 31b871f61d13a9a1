#!/bin/bash
# Round-5 queue 7 (final arms): round_samples floor at the RELIABLE beam 8
# (quality-exact to the same T<1e-4 tolerance as rounds itself), the
# frame-split combo, and the final recorded headline pair.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q7.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python bench.py --round_samples 4
run python bench.py --round_samples 4 --frame_phase_a
run python bench.py
run python bench.py
echo "QUEUE7-DONE" >> "$LOG"
