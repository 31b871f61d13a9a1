#!/bin/bash
# Full navigation loop on a trained scene (reference README "Simulating"):
# plan -> act -> observe -> estimate -> replan. Stonehenge defaults.
# Usage: scripts/run_sim.sh <data_path> [workspace]
DATA=${1:-data/stonehenge}
WS=${2:-trial_sim}
python -m nerfnav_tpu.cli.simulate "$DATA" --workspace "$WS" -O \
    --bound 2.0 --scale 1.0 --dt_gamma 0
