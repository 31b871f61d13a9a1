#!/bin/bash
# Round-5 queue 5: frame-level phase-A split A/B (the round's second
# structural attack), beam/chunk utilization arms, trained-ckpt refresh.
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
run python bench.py --frame_phase_a
run python bench.py --frame_phase_a --beam 16
run python bench.py --frame_phase_a --chunk 16384
run python bench.py --beam 16 --chunk 16384
run python bench.py --frame_phase_a --beam 16 --chunk 16384
run python bench.py --beam 16 --round_samples 4
CKPT=$(ls /tmp/r4_drift/*/checkpoints/drift_control_ep0010.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  run python bench.py --ckpt "$CKPT" --beam 16
  run python bench.py --ckpt "$CKPT" --frame_phase_a
fi
echo "QUEUE5-DONE" >> "$LOG"
