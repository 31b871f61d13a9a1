#!/bin/bash
# Round-5 queue 5: push past the dilation fix. Beam-16 utilization arms
# (chunk width: beamed phase A shapes are n/16-wide — the 4096 knee was
# measured at beam 1), the round_samples floor, and the trained-ckpt
# headline refresh on the fixed beam path.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q5.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python bench.py --beam 16 --chunk 16384
run python bench.py --beam 16 --chunk 8192
run python bench.py --beam 16 --round_samples 4
CKPT=$(ls /tmp/r4_drift/*/checkpoints/drift_control_ep0010.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  run python bench.py --ckpt "$CKPT" --beam 16
  run python bench.py --ckpt "$CKPT" --beam 8
fi
echo "QUEUE5-DONE" >> "$LOG"
