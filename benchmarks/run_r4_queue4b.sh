#!/bin/bash
# Round-4 queue 4b: the TRIMMED remainder of queue 4 — every arm compiles
# fresh (~15-20 min each through the remote-compile relay after the
# MarchConfig.gamma_span field invalidated the cache), so only the decisive
# arms survive. Dropped (with reasons in RESULTS.md): gamma --no-occ_ladder
# control (round-3 1.54M stands as the unplanned control), k32/k12
# first_k+proxy (k16 is the candidate), 3x8/2x8 lattice (2x16 is the
# halved-rows candidate), the middle ckpt arm.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r4_q4.log}
CKPT=${CKPT:-/tmp/r4_ckpts/drift_control_ep0010.npz}
WS=${WS:-/tmp/tmpd14uls73}
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run python bench.py --k 16 --first_k --proxy
run python bench.py --levels 2 --level_dim 16
run python bench.py --ckpt "$CKPT"
run python bench.py --ckpt "$CKPT" --k 16 --first_k --proxy
run python benchmarks/eval_trims_30k.py --workspace "$WS" \
    --name drift_control --set firstk_proxy
run python benchmarks/nav_bench.py --skip_planner --filter_render all \
    --filter_opt gn --poi_backend orb --poi_downscale 2
run python benchmarks/nav_bench.py --skip_planner --filter_render all \
    --filter_opt gn --poi_backend sift --poi_downscale 2
run python benchmarks/profile_render.py
echo "QUEUE4-DONE" >> "$LOG"
