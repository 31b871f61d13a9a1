#!/bin/bash
# Round-3 queue 9: thresh_freeze drift validation (item 3 decisive arm).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q9.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python benchmarks/drift_probe.py --variant thresh_freeze
echo "QUEUE9-DONE" >> "$LOG"
