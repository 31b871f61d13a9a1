#!/bin/bash
# Round-4 queue 6b: reordered remainder of queue 6. The first headline arm
# came back a LOSS (k16+first_k+proxy 2.23M vs control 3.29M — the rounds
# path already early-terminates; march-side compaction only adds cost) and
# 2x16 a mild WIN (3.40M), so profile_render's stage attribution is now the
# decisive input for the round's structural attack — it moves FIRST, ahead
# of the 35-min drift arm. Then: hysteresis drift arm (doubles as trained-
# ckpt regen after the /tmp wipe), trained-ckpt headline, the NEW fused
# one-program MPC tick, and the occ-inclusive train rate.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PATH=/opt/venv/bin:$PATH
LOG=${LOG:-/tmp/r4_q6.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
# wait for the orphaned gamma arm (PID on the command line at launch time)
while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
run python benchmarks/profile_render.py
mkdir -p /tmp/r4_drift
run env TMPDIR=/tmp/r4_drift python benchmarks/drift_probe.py --variant hysteresis
WS=$(ls -d /tmp/r4_drift/*/checkpoints 2>/dev/null | head -1 | xargs dirname)
CKPT=$(ls "$WS"/checkpoints/drift_hysteresis_best.npz 2>/dev/null | head -1)
echo "WS=$WS CKPT=$CKPT" >> "$LOG"
run python bench.py --ckpt "$CKPT"
run python benchmarks/nav_bench.py --skip_planner --fused_cycle \
    --filter_render dense --filter_opt gn --poi_backend sift --poi_downscale 2
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
echo "QUEUE6B-DONE" >> "$LOG"
