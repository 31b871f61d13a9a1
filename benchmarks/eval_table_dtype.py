"""Eval-time hash-table dtype A/B on a converged checkpoint.

bf16 tables halve the hash-grid's HBM footprint (the render bottleneck is
gather rows into those tables — bench.py --table_dtype measures the speed
side). This script measures the QUALITY side: reload a trained checkpoint,
cast the encoder tables to bfloat16, and re-eval val PSNR. Quantizing at
eval only (training stays fp32) matches how the knob would ship.

CPU-runnable (--cpu): quality is platform-independent, so this does not
need the chip. Usage:
  python benchmarks/eval_table_dtype.py --workspace /tmp/tmpehxyp8rh --cpu
"""
import argparse
import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True,
                    help="workspace dir holding trained q_cell checkpoints")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU platform (quality only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.data.synthetic import cluttered_field, make_synthetic_scene
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    scene_dir = tempfile.mkdtemp()
    make_synthetic_scene(scene_dir, field=cluttered_field(), n_train=24,
                         n_val=2, H=args.res, W=args.res, num_steps=256)
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")

    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    opt = TrainerOptions(name="q_cell", workspace=args.workspace, lr=1e-2,
                         iters=30000, num_rays=4096, use_checkpoint="latest",
                         bg_train="white")
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0),
                 march_cfg=MarchConfig(bound=1.0, samples_per_ray=32,
                                       min_near=0.05))
    tr.state = tr._init_state(len(NeRFDataset(
        DatasetOptions(path=scene_dir, scale=1.0), "train")))
    tr._maybe_resume()
    tr.stats["best_result"] = 1e9   # don't clobber the stored best ckpt

    out = {}
    # 4 decimals: the delta this A/B measures is ~1e-4 dB
    out["fp32"] = round(tr.evaluate(val_ds, use_ema=True), 4)
    print(json.dumps({"fp32": out["fp32"]}), flush=True)

    # cast the trained tables (eval uses ema_params)
    ema = dict(tr.state.ema_params)
    ema["encoder"] = [t.astype(jnp.bfloat16) for t in ema["encoder"]]
    tr.state = tr.state._replace(ema_params=ema)
    tr.invalidate_render_cache()
    out["bf16_tables"] = round(tr.evaluate(val_ds, use_ema=True), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
