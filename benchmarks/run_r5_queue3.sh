#!/bin/bash
# Round-5 queue 3: the debounce drift arm (candidate C — the synthesis of
# six failed arms: filter ACTIVATION, leave memory and carving alone).
# Bar: control semantics (no freeze, reference lr horizon) >= 28 dB at 30k.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q3.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/drift_probe.py --variant debounce
echo "QUEUE3-DONE" >> "$LOG"
