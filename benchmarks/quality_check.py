"""At-scale quality validation: train the full-size field on a synthetic
scene with the occupancy fast path and report eval PSNR — validates the
whole training stack (march + encode + MLP + occupancy maintenance) on real
hardware, and compares the reference-exact `corner` hash layout with the
TPU-fast `cell` layout.

Usage: python benchmarks/quality_check.py [--steps 1500] [--layout cell|corner|both]
"""

import argparse
import json
import tempfile
import time


def run(layout: str, scene_dir: str, steps: int, levels: int = 16,
        level_dim: int = 2, log2_hashmap: int | None = None,
        render_path: str = "grid", normalized_march: bool = True,
        lr_iters: int = 0, occ_freeze_after: float = -1.0):
    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")

    cfg = NetworkConfig(
        bound=1.0, mlp_dtype="bfloat16", grid_layout=layout,
        grid_log2_hashmap_size=(
            log2_hashmap if log2_hashmap is not None
            else 16 if layout == "cell" else 19
        ),
        grid_levels=levels, grid_level_dim=level_dim,
    )
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    sched = {}
    if lr_iters:
        sched["lr_iters"] = lr_iters
    if occ_freeze_after >= 0.0:       # -1 = the shipped TrainerOptions default
        sched["occ_freeze_after"] = occ_freeze_after
    opt = TrainerOptions(eval_beam=1,  # pin: quality curves compare across rounds
        name=f"q_{layout}", workspace=tempfile.mkdtemp(), lr=1e-2, iters=30000,
        num_rays=4096, use_checkpoint="scratch", bg_train="white",
        **sched,
    )
    if render_path == "grid":
        tr = Trainer(cfg, rcfg, opt,
                     occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                                   density_thresh=5.0),
                     march_cfg=MarchConfig(bound=1.0, samples_per_ray=32,
                                           min_near=0.05,
                                           coarse_normalized=normalized_march))
    else:
        tr = Trainer(cfg, rcfg, opt)
    t0 = time.time()
    tr.train(train_ds, max_epochs=1, steps_per_epoch=steps)
    train_time = time.time() - t0
    psnr = tr.evaluate(val_ds, use_ema=True)
    return {"layout": layout, "levels": levels, "level_dim": level_dim,
            "render_path": render_path, "psnr": round(psnr, 2),
            "train_time_s": round(train_time, 1),
            "steps_per_sec": round(steps / train_time, 2)}


from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--layout", default="both")
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--levels", type=int, default=16)
    p.add_argument("--level_dim", type=int, default=2)
    p.add_argument("--log2_hashmap", type=int, default=None)
    p.add_argument("--render_path", default="grid", choices=["grid", "dense"])
    p.add_argument("--fixed_march", action="store_true",
                   help="disable the normalized phase-A ladder (A/B control)")
    p.add_argument("--scene", default="sphere", choices=["sphere", "cluttered"],
                   help="textured sphere or the multi-object cluttered scene")
    p.add_argument("--views", type=int, default=24,
                   help="training views (raise for high-res runs: a "
                        "Stonehenge-class 800^2 dataset wants 50-100)")
    p.add_argument("--val_views", type=int, default=2)
    p.add_argument("--lr_iters", type=int, default=0,
                   help="lr horizon override (0 = iters; 20000 = the "
                        "retired round-2/3 lr_fast schedule the 37.67 dB "
                        "number ran)")
    p.add_argument("--occ_freeze_after", type=float, default=-1.0,
                   help="-1 = shipped default (0.2*iters); 0 = never "
                        "freeze (reference maintenance to 30k)")
    args = p.parse_args()

    from nerfnav_tpu.data.synthetic import (
        cluttered_field, make_synthetic_scene, textured_sphere_field,
    )

    scene_dir = tempfile.mkdtemp()
    field = (cluttered_field() if args.scene == "cluttered"
             else textured_sphere_field())
    make_synthetic_scene(scene_dir, field=field,
                         n_train=args.views, n_val=args.val_views,
                         H=args.res, W=args.res, num_steps=256)
    layouts = ["cell", "corner"] if args.layout == "both" else [args.layout]
    for layout in layouts:
        print(json.dumps(run(layout, scene_dir, args.steps, args.levels,
                              args.level_dim, args.log2_hashmap,
                              args.render_path,
                              normalized_march=not args.fixed_march,
                              lr_iters=args.lr_iters,
                              occ_freeze_after=args.occ_freeze_after)))


if __name__ == "__main__":
    main()
