#!/bin/bash
# Second chip-experiment wave: starts only after run_r2_queue.sh logs
# QUEUE9 DONE (one TPU process at a time).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue2.log; }

log "waiting for queue 10..."
for i in $(seq 1 600); do
  grep -q "QUEUE10 DONE" /tmp/r2_queue10.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE10 DONE" /tmp/r2_queue10.log || { log "queue 10 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q2_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q2_$name.log)"
}

# training-time march trim: does seg12 hurt TRAINING quality (fat grid early)?
run qual_seg12 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import json, tempfile
from benchmarks.quality_check import run as qrun
from nerfnav_tpu.data.synthetic import make_synthetic_scene, textured_sphere_field
scene = tempfile.mkdtemp()
make_synthetic_scene(scene, field=textured_sphere_field(), n_train=24, n_val=2,
                     H=128, W=128, num_steps=256)
# monkey-level: qrun has no seg knob; inline a variant here
from nerfnav_tpu.data import NeRFDataset
from nerfnav_tpu.data.provider import DatasetOptions
from nerfnav_tpu.models import NetworkConfig, RenderConfig
from nerfnav_tpu.models.occupancy import OccupancyConfig
from nerfnav_tpu.ops.marching import MarchConfig
from nerfnav_tpu.training import Trainer, TrainerOptions
import time
for segs in (16, 12):
    train_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "val")
    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    opt = TrainerOptions(name=f"seg{segs}", workspace=tempfile.mkdtemp(),
                         lr=1e-2, iters=30000, num_rays=4096,
                         use_checkpoint="scratch", bg_train="white")
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0),
                 march_cfg=MarchConfig(bound=1.0, samples_per_ray=32,
                                       min_near=0.05, coarse_segments=segs))
    t0 = time.time()
    tr.train(train_ds, max_epochs=1, steps_per_epoch=1500)
    dt = time.time() - t0
    psnr = tr.evaluate(val_ds, use_ema=True)
    print(json.dumps({"train_segs": segs, "psnr": round(psnr, 2),
                      "steps_per_sec": round(1500 / dt, 2)}), flush=True)
EOF

# render combos on top of whatever single-knob wins: measured individually in
# wave 1; these give the interaction terms
run bench_dep_bf16 python bench.py --shade_order depth --table_dtype bfloat16
run bench_l16_dep  python bench.py --log2 16 --shade_order depth
run nav            python benchmarks/nav_bench.py
log "QUEUE2 DONE"
