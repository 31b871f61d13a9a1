#!/bin/bash
# Round-4 queue 7: the beam headline arms + the re-planned remainder.
# Hysteresis was killed at epoch 5 (plateau ~19.6 dB from epoch 1 vs
# control 26.6/28.0 — sticky carve bar keeps the grid dense and the static
# K budget diluted; failed-at-sight like bf16_tables). Its 19.6 dB ckpt is
# useless as the trained-ckpt source, so the ckpt regen arm reverts to
# CONTROL. Beam arms (the round's structural attack: phase A is 108 of the
# 262 ms frame) go FIRST.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r4_q7.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py --beam 4
run python bench.py --beam 8
mkdir -p /tmp/r4_drift
run env TMPDIR=/tmp/r4_drift python benchmarks/drift_probe.py --variant control
WS=$(ls -d /tmp/r4_drift/*/checkpoints 2>/dev/null | head -1 | xargs dirname)
CKPT=$(ls "$WS"/checkpoints/drift_control_best.npz 2>/dev/null | head -1)
echo "WS=$WS CKPT=$CKPT" >> "$LOG"
run python bench.py --ckpt "$CKPT"
run python bench.py --ckpt "$CKPT" --beam 8
run python benchmarks/nav_bench.py --skip_planner --fused_cycle \
    --filter_render dense --filter_opt gn --poi_backend sift --poi_downscale 2
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
echo "QUEUE7-DONE" >> "$LOG"
