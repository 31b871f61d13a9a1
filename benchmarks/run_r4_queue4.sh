#!/bin/bash
# Round-4 queue 4: the headline attack (verdict item 2) + gamma plan (item 6).
#   1. synthetic control (post-refactor sanity vs the 3.30M r3 number)
#   2. gamma plan A/B: plan_gamma_span bounds the static gamma ladder
#      (target: within 2x of gamma=0; was 2.14x)
#   3. first_k x proxy speed arms on the synthetic shell
#   4. trained-checkpoint arms (bench --ckpt; drift_control ep10)
#   5. first_k x proxy QUALITY gate on the 30k checkpoint
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
run python bench.py
run python bench.py --dt_gamma 0.0078125
run python bench.py --dt_gamma 0.0078125 --no-occ_ladder
run python bench.py --first_k --proxy
run python bench.py --k 16 --first_k --proxy
run python bench.py --k 12 --first_k --proxy
#   3b. shading-row curve: rows/sample = grid_levels (the render is
#       gather-RATE bound; 4 levels x 8 dims is the flagship). 2x16 halves
#       the shading rows at equal feature width — quality arm only if the
#       speed win is real
run python bench.py --levels 3 --level_dim 8
run python bench.py --levels 2 --level_dim 16
run python bench.py --levels 2 --level_dim 8
run python bench.py --ckpt "$CKPT"
run python bench.py --ckpt "$CKPT" --first_k --proxy
run python bench.py --ckpt "$CKPT" --k 16 --first_k --proxy
run python benchmarks/eval_trims_30k.py --workspace "$WS" \
    --name drift_control --set firstk_proxy
#   6. nav: dense+GN with the cheap ORB front-end (never timed) — if its
#      update is ~<=160 ms its pos_drift is unbiased (the obs sensor IS the
#      dense render in the NeRF-obs mission) and the >=5 Hz + <=1 mm bars
#      can be met together without the frozen path's model-mismatch bias
run python benchmarks/nav_bench.py --skip_planner --filter_render all \
    --filter_opt gn --poi_backend orb --poi_downscale 2
#   6b. CPU bisect (H=200): frozen+sift 19.6mm, frozen+orb 1.1mm,
#       dense+sift 0.17mm, dense+orb 2.2mm — dense+sift is the unbiased
#       combination; measure its chip cost at 800^2
run python benchmarks/nav_bench.py --skip_planner --filter_render all \
    --filter_opt gn --poi_backend sift --poi_downscale 2
#   7. fresh stage breakdown (march / encode+MLP / composite ratios) to aim
#      the next structural render attack
run python benchmarks/profile_render.py
echo "QUEUE4-DONE" >> "$LOG"
