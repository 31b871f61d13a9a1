#!/bin/bash
# Round-5 queue 7b: trained-ckpt re-runs (the 06:37 arms died on a
# transient TPU FAILED_PRECONDITION that cleared by the next run).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q7b.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
CKPT=$(ls /tmp/r4_drift/*/checkpoints/drift_control_ep0010.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  run python bench.py --ckpt "$CKPT"
  run python bench.py --ckpt "$CKPT" --round_samples 4
fi
echo "QUEUE7B-DONE" >> "$LOG"
