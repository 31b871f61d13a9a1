"""Dataset-free quickstart: train a NeRF, evaluate it, render a video, and
plan a collision-free trajectory through the trained density field.

Runs anywhere (CPU by default via --cpu; drop the flag on a TPU host). The
scene is synthesized on the fly (`data.synthetic.make_synthetic_scene` — a
textured sphere with orbit cameras), so no dataset download is needed. The
same five stages against a real scene are: scripts/run_nerf.sh (train) and
scripts/run_sim.sh (navigate).

Usage:
    python examples/quickstart.py --cpu                # ~3 min, tiny sizes
    python examples/quickstart.py --steps 2000 --hw 128  # better quality
"""

import argparse
import os
import sys
import tempfile

# runnable from a source checkout without an install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default off: use the "
                         "platform jax picked, e.g. a TPU)")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--hw", type=int, default=40, help="train image side")
    ap.add_argument("--out", default=None,
                    help="workspace dir (default: a temp dir)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # must happen before the first jax op; env vars are too late here
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.data.synthetic import make_synthetic_scene
    from nerfnav_tpu.models import NetworkConfig, RenderConfig, make_field
    from nerfnav_tpu.training import Trainer, TrainerOptions

    out = args.out or tempfile.mkdtemp(prefix="nerfnav_quickstart_")
    print(f"[quickstart] workspace: {out}")

    # ---- 1. synthesize a scene (textured sphere, orbit cameras) ----------
    scene = os.path.join(out, "scene")
    make_synthetic_scene(scene, n_train=8, n_val=2, H=args.hw, W=args.hw,
                         num_steps=64)
    train_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "val")

    # ---- 2. train on the occupancy-grid fast path -------------------------
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig

    cfg = NetworkConfig(bound=1.0, grid_layout="cell", grid_levels=4,
                        grid_level_dim=8, grid_log2_hashmap_size=13,
                        grid_max_resolution=128)
    rcfg = RenderConfig(num_steps=48, upsample_steps=0, min_near=0.05,
                        max_ray_batch=2048)
    opt = TrainerOptions(name="quickstart", workspace=os.path.join(out, "ws"),
                         lr=1e-2, iters=max(args.steps, 1000), num_rays=512,
                         use_checkpoint="scratch", bg_train="white",
                         eval_interval=1)
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0,
                                               grid_size=64),
                 march_cfg=MarchConfig(bound=1.0, grid_size=64,
                                       samples_per_ray=32, min_near=0.05))
    tr.train(train_ds, valid_ds=None, max_epochs=3,
             steps_per_epoch=args.steps // 3)

    # ---- 3. evaluate -------------------------------------------------------
    psnr = float(tr.evaluate(val_ds, use_ema=False))
    print(f"[quickstart] val PSNR after {args.steps} steps: {psnr:.2f} dB")

    # ---- 4. render a held-out orbit video ---------------------------------
    frames = tr.test(val_ds, write_video=True, name="orbit")
    print(f"[quickstart] wrote {len(frames)} frames + video under "
          f"{os.path.join(opt.workspace, 'results')}")

    # ---- 5. plan a trajectory through the trained density -----------------
    from nerfnav_tpu.nav.planner import Planner, PlannerConfig

    field = make_field(tr.state.params, cfg)
    density_fn = lambda x: field.density_fn(x)[0]  # noqa: E731

    def state18(pos):
        s = np.zeros(18, np.float32)
        s[0:3] = pos
        s[6:15] = np.eye(3).reshape(-1)
        return s

    pcfg = PlannerConfig(T=12, dt=0.1, epochs_init=300, astar_fine=40,
                         astar_coarse=20, astar_thresh=2.0)
    planner = Planner(state18([-0.7, 0.0, 0.0]), state18([0.7, 0.0, 0.0]),
                      pcfg, density_fn,
                      workspace=os.path.join(out, "plan"), exp_name="demo")
    planner.a_star_init()
    losses = planner.learn_init()
    pos = np.asarray(planner.get_full_states()["pos"])
    clearance = float(np.sqrt((pos**2).sum(-1)).min())
    # make_synthetic_scene trains against sphere_field(radius=0.5)
    print(f"[quickstart] planner: loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
          f"closest approach to the (r=0.5) sphere: {clearance:.3f}"
          + ("  [CLEAR]" if clearance > 0.5 else "  [COLLISION!]"))
    print(f"[quickstart] trajectory JSON artifacts: {out}/plan/init_poses/demo")
    print("[quickstart] done.")


if __name__ == "__main__":
    main()
