#!/bin/bash
# Round-5 queue 6 (tail): the gamma stage attribution (slow compiles —
# deliberately last), the at-scale quality check under the shipped
# defaults, and a final headline re-run.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q6.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/profile_render.py --dt_gamma 0.0078125 --stages "march only,A stop,A+B,rounds"
echo "QUEUE6-DONE" >> "$LOG"
