#!/bin/bash
# Interactive training + web viewer (reference scripts/run_gui_nerf.sh; the
# dearpygui desktop window becomes a local web viewer — forward the port over
# SSH when the TPU host is remote).
DATA=${1:-data/nerf_synthetic/lego}
WS=${2:-trial_nerf_gui}
python -m nerfnav_tpu.cli.main_nerf "$DATA" --workspace "$WS" -O \
    --bound 1.0 --scale 0.8 --dt_gamma 0 --gui
