#!/bin/bash
# Sixth chip wave: bf16 table-compute training A/B (knob landed after queue 3
# was armed). Starts after QUEUE5 DONE; one TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue6.log; }

log "waiting for queue 5..."
for i in $(seq 1 600); do
  grep -q "QUEUE5 DONE" /tmp/r2_queue5.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE5 DONE" /tmp/r2_queue5.log || { log "queue 5 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q6_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q6_$name.log)"
}

run train_bf16 python benchmarks/train_bench.py --levels 4 --level_dim 8 --log2 17 --shell --table_dtype bfloat16
# quality side of bf16 TRAINING tables (eval-side already proven free)
run qual_bf16  python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import json, tempfile, time
from benchmarks.quality_check import run as _
from nerfnav_tpu.data import NeRFDataset
from nerfnav_tpu.data.provider import DatasetOptions
from nerfnav_tpu.data.synthetic import make_synthetic_scene, textured_sphere_field
from nerfnav_tpu.models import NetworkConfig, RenderConfig
from nerfnav_tpu.models.occupancy import OccupancyConfig
from nerfnav_tpu.ops.marching import MarchConfig
from nerfnav_tpu.training import Trainer, TrainerOptions
scene = tempfile.mkdtemp()
make_synthetic_scene(scene, field=textured_sphere_field(), n_train=24, n_val=2,
                     H=128, W=128, num_steps=256)
for dtype in ("float32", "bfloat16"):
    train_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "val")
    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8, grid_table_dtype=dtype)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    opt = TrainerOptions(name=f"tbl_{dtype}", workspace=tempfile.mkdtemp(),
                         lr=1e-2, iters=30000, num_rays=4096,
                         use_checkpoint="scratch", bg_train="white")
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0),
                 march_cfg=MarchConfig(bound=1.0, samples_per_ray=32,
                                       min_near=0.05))
    t0 = time.time()
    tr.train(train_ds, max_epochs=1, steps_per_epoch=1500)
    dt = time.time() - t0
    psnr = tr.evaluate(val_ds, use_ema=True)
    print(json.dumps({"table_dtype": dtype, "psnr": round(psnr, 2),
                      "steps_per_sec": round(1500 / dt, 2)}), flush=True)
EOF
log "QUEUE6 DONE"
