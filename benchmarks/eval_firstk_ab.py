"""Train once on the textured sphere (grid fast path), then eval the SAME
trained field under march-config variants — isolates the eval-time quality
cost of a march-config change. The `variants` dict below is the CURRENT
sweep (edit it per experiment); the A/B history it produced (K-shrink,
first-K, segment/anchor trims, coarse_first_k) is recorded in
benchmarks/RESULTS.md.

Chip run: PYTHONPATH=/root/repo python benchmarks/eval_firstk_ab.py
"""
import dataclasses
import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")
from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

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
train_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "train")
val_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "val")

cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout="cell",
                    grid_log2_hashmap_size=17, grid_levels=4, grid_level_dim=8)
rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
opt = TrainerOptions(name="abfk", workspace=tempfile.mkdtemp(), lr=1e-2,
                     iters=30000, num_rays=4096, use_checkpoint="scratch",
                     bg_train="white")
mtrain = MarchConfig(bound=1.0, samples_per_ray=32, min_near=0.05)
tr = Trainer(cfg, rcfg, opt,
             occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                           density_thresh=5.0),
             march_cfg=mtrain)
tr.train(train_ds, max_epochs=1, steps_per_epoch=1500)

variants = {
    # round-4 sweep (verdict item 2b): first_k and the segment proxy have
    # never been A/B'd TOGETHER at the flagship eval trims. Quality gate:
    # within 0.1 dB of control to adopt for the headline config.
    "k32_spread": dict(samples_per_ray=32),
    "k32_firstk": dict(samples_per_ray=32, first_k=True),
    "k32_proxy": dict(samples_per_ray=32, proxy_terminate=True),
    "k32_firstk_proxy": dict(samples_per_ray=32, first_k=True,
                             proxy_terminate=True),
    "k32_seg12_anch2_firstk_proxy": dict(samples_per_ray=32, first_k=True,
                                         proxy_terminate=True,
                                         coarse_segments=12,
                                         coarse_anchors=2),
}
out = {}
for name, kw in variants.items():
    tr.march_cfg = dataclasses.replace(mtrain, **kw)
    tr.invalidate_render_cache()
    out[name] = round(float(tr.evaluate(val_ds, use_ema=True)), 2)
    print(json.dumps({name: out[name]}), flush=True)
print(json.dumps(out))
