#!/bin/bash
# Round-4 queue 8: post-drift remainder. Beam headline arms measured 3.42M
# (beam 4, +4%) / 3.72M (beam 8, +13.1%) vs the 3.286M control — gain is
# superlinear in width, so beam 16 runs next (the 1-cell dilation still
# covers the 15-pixel spread at every cascade; see MarchConfig.beam).
# Then the trained-ckpt headline arms, the fused one-program MPC tick, and
# a profile matched to the BENCH config (--t_a0 97: the earlier profile ran
# the UNPLANNED ladder, which exaggerated the march share and oversold the
# beam lever — attribution must match the config it aims).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r4_q8.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python bench.py --beam 16
WS=$(ls -d /tmp/r4_drift/*/checkpoints 2>/dev/null | head -1 | xargs dirname)
CKPT=$(ls "$WS"/checkpoints/drift_control_best.npz 2>/dev/null | head -1)
echo "WS=$WS CKPT=$CKPT" >> "$LOG"
run python bench.py --ckpt "$CKPT"
run python bench.py --ckpt "$CKPT" --beam 8
run python benchmarks/nav_bench.py --skip_planner --fused_cycle \
    --filter_render dense --filter_opt gn --poi_backend sift --poi_downscale 2
run python benchmarks/profile_render.py --t_a0 97
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
echo "QUEUE8-DONE" >> "$LOG"
