#!/bin/bash
# Round-5 queue 4: (1) bench regression check + new headline with the
# precomputed beam dilation; (2) the debounce drift arm; (3) beam-8
# utilization arms (chunk size — attribution says the beamed phase A is
# small-shape/dispatch-bound, so the 4096 knee measured at beam 1 may
# move); (4) beam-16 retest on the fixed path; (5) re-profile.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r5_q4.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python bench.py
run python bench.py --beam 1
run python benchmarks/drift_probe.py --variant debounce
run python bench.py --chunk 8192
run python bench.py --chunk 16384
run python bench.py --beam 16
run python benchmarks/profile_render.py --t_a0 97 --beam 8 --stages "march,rounds"
run python bench.py
echo "QUEUE4-DONE" >> "$LOG"
