#!/bin/bash
# Round-3 render queue 1: fresh control, product-path parity, compile-shape
# autotune, anchor/segment/K probes, gamma fast-path number.
# ONE chip process at a time; nothing else may run on the host while this
# does (RESULTS.md measurement hygiene).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r3_q1.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py                                   # r3 control (defaults)
run python benchmarks/trainer_render_bench.py        # product path (item 1)
run python bench.py --autotune                       # compile-shape autotune
run python bench.py --coarse_anchors 1               # 1-anchor probe
run python bench.py --coarse_segments 10             # seg10 (quality-neutral on 30k ckpt)
run python bench.py --round_samples 4
run python bench.py --k 24
run python bench.py --dt_gamma 0.0078125             # colmap default (item 7)
run python bench.py --dt_gamma 0.0078125 --g_a 0 --coarse_segments 16  # gamma, training-ish segs
echo "QUEUE1-DONE" >> "$LOG"
