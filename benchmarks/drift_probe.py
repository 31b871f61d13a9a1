"""Late-schedule drift probe (RESULTS.md round-2 quality section).

The 30k-step reference-schedule run ends 0.47 dB BELOW its own 3k-step
checkpoint on the cluttered scene. error_map is ruled out (off by default and
never enabled in quality_check). Remaining suspects:

  H-occ:   occupancy over-carving — the update threshold min(mean_density,
           density_thresh) rises as the field sharpens (reference
           renderer.py:508), so late sweeps carve thin surface cells.
  H-noise: stratified stride-phase noise at the dt-anneal floor (reached at
           0.2*iters = 6k) with lr still ~1e-3..1e-2 for most of the run.

This probe trains the flagship config in 3k-step epochs with a val eval per
epoch, producing the drift CURVE for each variant:

  control     — exactly the quality_check protocol
  occ_freeze  — occupancy maintenance frozen after 6k steps (tests H-occ)
  lr_fast     — iters=20000 lr horizon (final lr 3.2e-4; tests H-noise x lr)
  ray_hash    — deterministic per-ray stride phase under the REFERENCE lr
                horizon (MarchConfig.stride_phase; round-3 candidate fix:
                removes the per-step lattice noise at source — Done =
                final >= 28 dB with lr_iters = iters)

One TPU process at a time; ~17 min/variant on chip plus evals.
"""
import argparse
import json
import tempfile

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def run_variant(name: str, scene_dir: str, total_steps: int, epoch_steps: int,
                occ_freeze_after: int = 0, lr_iters: int = 30000,
                stride_phase: str = "random",
                occ_thresh_freeze_after: float = 0.0,
                mlp_dtype: str = "bfloat16",
                grid_table_dtype: str = "float32",
                ema_sampled_only: bool = False,
                occ_hysteresis: float = 0.0,
                density_write_clamp: float = 0.0,
                ema_toward_query: bool = False,
                occ_debounce: bool = False,
                grid_levels: int = 4, grid_level_dim: int = 8):
    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")
    cfg = NetworkConfig(bound=1.0, mlp_dtype=mlp_dtype, grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=grid_levels,
                        grid_level_dim=grid_level_dim,
                        grid_table_dtype=grid_table_dtype)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    # iters stays 30000 so the fractional dt-anneal thresholds are IDENTICAL
    # across variants; only the lr horizon moves (lr_iters) — otherwise the
    # lr_fast A/B would also shift the marching schedule and confound H-noise
    opt = TrainerOptions(name=f"drift_{name}", workspace=tempfile.mkdtemp(),
                         lr=1e-2, iters=30000, lr_iters=lr_iters,
                         num_rays=4096,
                         use_checkpoint="scratch", bg_train="white",
                         eval_interval=1, occ_freeze_after=occ_freeze_after,
                         occ_thresh_freeze_after=occ_thresh_freeze_after,
                         stride_phase=stride_phase,
                         # beam evals stay OFF here: the drift ledger
                         # compares 0.1-dB curve deltas across rounds, and
                         # the AUTO eval beam (round 4) would add its own
                         # small lattice-phase term to every eval
                         eval_beam=1)
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0,
                                               ema_sampled_only=ema_sampled_only,
                                               occ_hysteresis=occ_hysteresis,
                                               density_write_clamp=density_write_clamp,
                                               ema_toward_query=ema_toward_query,
                                               occ_debounce=occ_debounce),
                 march_cfg=MarchConfig(bound=1.0, samples_per_ray=32,
                                       min_near=0.05))
    import numpy as np

    occ_fracs, churn, mean_dens = [], [], []
    prev_bits = None
    for _ in range(total_steps // epoch_steps):
        tr.train(train_ds, valid_ds=val_ds, max_epochs=1,
                 steps_per_epoch=epoch_steps)
        # occupancy trajectory: fraction occupied, per-epoch bitfield churn
        # (hamming / n_cells), mean density — the round-4 churn hypothesis'
        # diagnostics ride along with every arm
        bits = np.unpackbits(np.asarray(tr.state.occupancy["bitfield"]))
        occ_fracs.append(round(float(bits.mean()), 4))
        churn.append(0.0 if prev_bits is None
                     else round(float((bits != prev_bits).mean()), 5))
        prev_bits = bits
        mean_dens.append(round(float(tr.state.occupancy["mean_density"]), 3))
    curve = [round(float(p), 3) for p in tr.stats["results"]]
    print(json.dumps({"variant": name, "curve_every": epoch_steps,
                      "curve": curve,
                      "best": max(curve), "final": curve[-1],
                      "occ_frac": occ_fracs, "occ_churn": churn,
                      "mean_density": mean_dens}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="control",
                    choices=["control", "occ_freeze", "lr_fast", "ray_hash",
                             "thresh_freeze", "fp32_mlp", "bf16_tables",
                             "ema_sampled", "hysteresis",
                             "growth_clamp", "toward_query",
                             "clamp_and_toward", "debounce"])
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--epoch_steps", type=int, default=3000)
    ap.add_argument("--scene", default="cluttered")
    ap.add_argument("--levels", type=int, default=4,
                    help="grid levels (rows gathered per shaded sample — "
                         "the render is gather-rate bound; 2x16 halves the "
                         "shading rows of the 4x8 flagship)")
    ap.add_argument("--level_dim", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from nerfnav_tpu.data.synthetic import (
        cluttered_field, make_synthetic_scene, textured_sphere_field,
    )
    scene = tempfile.mkdtemp()
    field = cluttered_field() if args.scene == "cluttered" \
        else textured_sphere_field()
    make_synthetic_scene(scene, field=field, n_train=24, n_val=2,
                         H=128, W=128, num_steps=256)

    kw = {}
    if args.variant == "occ_freeze":
        kw["occ_freeze_after"] = 6000
    elif args.variant == "lr_fast":
        kw["lr_iters"] = 20000
    elif args.variant == "ray_hash":
        kw["stride_phase"] = "ray_hash"  # reference lr horizon stays
    elif args.variant == "thresh_freeze":
        # pin the carve bar at 6k (reference lr horizon stays): maintenance
        # and EMA-decay carving continue; only the min(mean, thresh) ratchet
        # stops (the softer form of occ_freeze). MEASURED round 4: COLLAPSES
        # (peak 28.40 @9k -> 23.48 final) — the ratchet is NOT the root
        # cause; occ_freeze's hold implicates some other maintenance term.
        kw["occ_thresh_freeze_after"] = 6000 / 30000
    elif args.variant == "fp32_mlp":
        # reference lr horizon + fp32 MLP compute: tests whether bf16 MLP
        # rounding x high late lr drives the collapse (the reference trains
        # fp16 UNDER A GRAD SCALER, main_nerf.py fp16 + torch autocast —
        # our bf16 path has no loss scaling; never A/B'd before round 4)
        kw["mlp_dtype"] = "float32"
    elif args.variant == "ema_sampled":
        # reference EMA valid-mask (decay only sampled cells). MEASURED round
        # 4: collapses EARLIER and DEEPER than decay-all (26.0 peak @3k ->
        # 21.5 final vs 28.4 -> 23.5) — reference parity loses under the
        # static sample budget; OccupancyConfig default stays decay-all.
        kw["ema_sampled_only"] = True
    elif args.variant == "hysteresis":
        # sticky occupancy carve bar (cells turn off only below 0.5*thresh):
        # tests the round-4 churn hypothesis — occ_freeze@6k holds >=28 and
        # ray_hash failed, leaving boundary-cell bitfield flicker as the
        # remaining sample-lattice noise source the late lr chases
        kw["occ_hysteresis"] = 0.5
    elif args.variant == "growth_clamp":
        # round-5 candidate A (the anti-ACCRETION arm, RESULTS round-4
        # diagnosis): fresh density writes clamped at 2*density_thresh
        # before the max-EMA — junk spikes stop inflating mean_density
        # (7.8 -> 142 in control) and lose their ~50-sweep decay immunity.
        # Reference lr horizon, occ maintenance runs to 30k, NO freeze.
        kw["density_write_clamp"] = 2.0
    elif args.variant == "toward_query":
        # round-5 candidate B: symmetric mean-EMA toward the fresh query
        # (debounces single-outlier activation; thin-feature under-marking
        # is the known risk). NO freeze, reference lr horizon.
        kw["ema_toward_query"] = True
    elif args.variant == "clamp_and_toward":
        kw["density_write_clamp"] = 2.0
        kw["ema_toward_query"] = True
    elif args.variant == "debounce":
        # round-5 candidate C (the synthesis arm): two-consecutive-
        # observation ACTIVATION filter; max-EMA memory and carving
        # untouched (growth_clamp: -5 dB by epoch 3 — faster carving adds
        # flicker; toward_query: -2.8 dB at epoch 1 — thin features need
        # the max memory; both killed early on chip, round-5 ledger).
        # Reference lr horizon, NO freeze.
        kw["occ_debounce"] = True
    elif args.variant == "bf16_tables":
        # quality gate for the +6.6% train throughput win (train_bench
        # --table_dtype bfloat16, RESULTS.md round-4 queue 1): full 30k
        # schedule with bf16 TRAIN-time table compute. Adopt as default
        # only if final PSNR matches control within 0.1 dB.
        kw["grid_table_dtype"] = "bfloat16"
    kw["grid_levels"] = args.levels
    kw["grid_level_dim"] = args.level_dim
    name = args.variant if (args.levels, args.level_dim) == (4, 8) \
        else f"{args.variant}_{args.levels}x{args.level_dim}"
    run_variant(name, scene, args.steps, args.epoch_steps, **kw)


if __name__ == "__main__":
    main()
