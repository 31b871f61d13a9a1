"""Eval-time march-trim A/B on the CONVERGED 30k-step cluttered checkpoint.

The 1500-step trim A/B (eval_firstk_ab) measured seg8 at -1.38 dB — but on
a partially carved (fat) grid, where segment-budget overflow thins the
march. The bench's premise is CONVERGED inference; this script reloads the
30k reference-schedule checkpoint (RESULTS.md quality run) and re-evals it
under the march variants to measure the trim cost where it matters.

Usage: python benchmarks/eval_trims_30k.py --workspace /tmp/tmpehxyp8rh
"""
import argparse
import dataclasses
import json
import tempfile

import sys

sys.path.insert(0, "/root/repo")
from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfnav_tpu.data import NeRFDataset
from nerfnav_tpu.data.provider import DatasetOptions
from nerfnav_tpu.data.synthetic import cluttered_field, make_synthetic_scene
from nerfnav_tpu.models import NetworkConfig, RenderConfig
from nerfnav_tpu.models.occupancy import OccupancyConfig
from nerfnav_tpu.ops.marching import MarchConfig
from nerfnav_tpu.training import Trainer, TrainerOptions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True,
                    help="workspace dir holding the 30k q_cell checkpoints")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--name", default="q_cell",
                    help="Trainer run name the checkpoints were saved under "
                         "(the drift-probe runs use drift_<variant>)")
    ap.add_argument("--set", default="segments",
                    choices=["segments", "firstk_proxy"],
                    help="variant sweep: segment trims (round-3) or the "
                         "first_k x proxy-termination grid (round-4, "
                         "verdict item 2b — the converged-scene sample-"
                         "shaving gate)")
    args = ap.parse_args()

    scene_dir = tempfile.mkdtemp()
    make_synthetic_scene(scene_dir, field=cluttered_field(), n_train=24,
                         n_val=2, H=args.res, W=args.res, num_steps=256)
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")

    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    base_march = MarchConfig(bound=1.0, samples_per_ray=32, min_near=0.05)
    opt = TrainerOptions(eval_beam=1,  # pin: quality curves compare across rounds
        name=args.name, workspace=args.workspace, lr=1e-2,
                         iters=30000, num_rays=4096, use_checkpoint="latest",
                         bg_train="white")
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0),
                 march_cfg=base_march)

    # build state + resume without training a step
    tr.state = tr._init_state(len(NeRFDataset(
        DatasetOptions(path=scene_dir, scale=1.0), "train")))
    tr._maybe_resume()
    # avoid clobbering the stored best checkpoint from eval-variant sweeps
    tr.stats["best_result"] = 1e9

    if args.set == "firstk_proxy":
        # K=32 + proxy marches identical samples (the budget is not binding
        # on a carved grid) — the speed win requires shrinking K too, which
        # is exactly what cost 2.5-7 dB on the 1500-step PARTIALLY-carved
        # grid (RESULTS.md pass-4 table). The converged 30k grid is the
        # regime the reference's 4-10-sample retirement exploits
        # (raymarching.cu:829-922); this set decides whether K-shrink +
        # first_k + proxy is quality-free there.
        variants = {
            "control": dict(),
            "firstk_proxy": dict(first_k=True, proxy_terminate=True),
            "k16_firstk_proxy": dict(samples_per_ray=16, first_k=True,
                                     proxy_terminate=True),
            "k12_firstk_proxy": dict(samples_per_ray=12, first_k=True,
                                     proxy_terminate=True),
            "k16_firstk": dict(samples_per_ray=16, first_k=True),
            "k16": dict(samples_per_ray=16),
        }
    else:
        variants = {
            "seg12_anch2": dict(coarse_segments=12, coarse_anchors=2),
            "seg10_anch2": dict(coarse_segments=10, coarse_anchors=2),
        }
    out = {}
    for name, kw in variants.items():
        tr.march_cfg = dataclasses.replace(base_march, **kw)
        tr.invalidate_render_cache()  # rebuild the jitted eval renderer
        psnr = tr.evaluate(val_ds, use_ema=True)
        out[name] = round(psnr, 2)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
