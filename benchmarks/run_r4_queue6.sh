#!/bin/bash
# Round-4 queue 6: re-run of the queue-4b decisive remainder after the
# machine reboot wiped /tmp (queue-4b logs, the 30k drift_control ckpts,
# and the compile cache all lost before harvest). Triage unchanged, with
# one substitution: the drift arm run here is HYSTERESIS (the live churn
# hypothesis, queue 5) and its workspace doubles as the trained-ckpt
# source for the --ckpt headline arms and the firstk_proxy quality gate
# (best ckpt = peak epoch; control's curve is already recorded).
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
# wait for the in-flight control bench (PID file) before claiming the chip
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 20; done
fi
# headline arms (verdict item 2): candidate trims on the synthetic shell
run python bench.py --k 16 --first_k --proxy
run python bench.py --levels 2 --level_dim 16
# gamma plan arm (verdict item 6): target within 2x of gamma=0 (was 2.14x)
run python bench.py --dt_gamma 0.0078125
# drift arm (verdict item 3) + ckpt regeneration: ~35 min
mkdir -p /tmp/r4_drift
run env TMPDIR=/tmp/r4_drift python benchmarks/drift_probe.py --variant hysteresis
WS=$(ls -d /tmp/r4_drift/*/checkpoints 2>/dev/null | head -1 | xargs dirname)
CKPT=$(ls "$WS"/checkpoints/drift_hysteresis_best.npz 2>/dev/null | head -1)
echo "WS=$WS CKPT=$CKPT" >> "$LOG"
# trained-ckpt headline arms (verdict item 2 'measured on a trained ckpt')
run python bench.py --ckpt "$CKPT"
run python bench.py --ckpt "$CKPT" --k 16 --first_k --proxy
# firstk_proxy quality gate on the converged ckpt
run python benchmarks/eval_trims_30k.py --workspace "$WS" \
    --name drift_hysteresis --set firstk_proxy
# nav (verdict item 5): chip cost of the unbiased dense+GN filter update
run python benchmarks/nav_bench.py --skip_planner --filter_render all \
    --filter_opt gn --poi_backend sift --poi_downscale 2
# training attribution (verdict item 4): occ-sweep-inclusive steps/s
run python benchmarks/train_bench.py --shell --levels 4 --level_dim 8 --log2 17
# fresh stage breakdown to aim the next structural render attack
run python benchmarks/profile_render.py
echo "QUEUE6-DONE" >> "$LOG"
