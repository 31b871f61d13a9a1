"""Eval-time march-config sweep: train ONCE on the synthetic sphere scene,
then re-evaluate the same checkpoint under different inference march configs
(sample budget K x proxy termination x normalized ladder). Quality must hold
as the budget shrinks for the proxy claim (ops/marching.py
proxy_terminate_valid) to be real.

Usage: python benchmarks/eval_sweep.py [--steps 600] [--res 96] [--cpu]
Prints one JSON line per eval config.
"""

import argparse
import dataclasses
import json
import tempfile
import time

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--res", type=int, default=96)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--levels", type=int, default=8)
    p.add_argument("--level_dim", type=int, default=4)
    p.add_argument("--log2", type=int, default=16)
    p.add_argument("--scene", default="sphere", choices=["sphere", "clutter"])
    p.add_argument("--layout", default="cell", choices=["cell", "corner"])
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.data.synthetic import (
        cluttered_field, make_synthetic_scene, textured_sphere_field,
    )
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    scene_dir = tempfile.mkdtemp()
    scene_field = (cluttered_field() if args.scene == "clutter"
                   else textured_sphere_field())
    make_synthetic_scene(scene_dir, field=scene_field,
                         n_train=24, n_val=2, H=args.res, W=args.res,
                         num_steps=256)
    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")

    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout=args.layout,
                        grid_log2_hashmap_size=args.log2,
                        grid_levels=args.levels, grid_level_dim=args.level_dim)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    base_mcfg = MarchConfig(bound=1.0, samples_per_ray=32, min_near=0.05)
    opt = TrainerOptions(eval_beam=1,  # pin: quality curves compare across rounds
        name="sweep", workspace=tempfile.mkdtemp(), lr=1e-2,
                        iters=30000, num_rays=4096, use_checkpoint="scratch",
                        bg_train="white")
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0),
                 march_cfg=base_mcfg)
    t0 = time.time()
    tr.train(train_ds, max_epochs=1, steps_per_epoch=args.steps)
    print(json.dumps({"train_steps": args.steps,
                      "train_time_s": round(time.time() - t0, 1)}))

    sweeps = [
        ("K32", dict(samples_per_ray=32)),
        ("K16", dict(samples_per_ray=16)),
        ("K16+proxy", dict(samples_per_ray=16, proxy_terminate=True)),
        ("K8+proxy", dict(samples_per_ray=8, proxy_terminate=True)),
    ]
    for name, kw in sweeps:
        tr.march_cfg = dataclasses.replace(base_mcfg, **kw)
        tr.invalidate_render_cache()
        t0 = time.time()
        psnr = tr.evaluate(val_ds, use_ema=True)
        dt1 = time.time() - t0
        t0 = time.time()
        psnr = tr.evaluate(val_ds, use_ema=True)   # warm timing
        dt2 = time.time() - t0
        print(json.dumps({"eval": name, "psnr": round(psnr, 2),
                          "eval_s_cold": round(dt1, 1),
                          "eval_s_warm": round(dt2, 1)}))


if __name__ == "__main__":
    main()
