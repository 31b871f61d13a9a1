"""Shared argparse flags.

Capability parity: the reference duplicates ~40 flags verbatim between
main_nerf.py:15-63 and simulate.py:109-157; here they live once. The `-O`
meta-flag expands differently per entry point exactly as in the reference:
training -> fp16 + grid fast path + preload (main_nerf.py:66-69); nav ->
fp16 + differentiable path + no preload (simulate.py:163-166, the nav loop
needs gradients through the renderer).
"""

import argparse


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("path", type=str, help="dataset root (transforms json)")
    p.add_argument("-O", action="store_true", help="recommended settings meta-flag")
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test", action="store_true")
    # training
    p.add_argument("--iters", type=int, default=30000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr_iters", type=int, default=0,
                   help="lr-decay horizon in steps; 0 = --iters (reference-"
                   "parity 0.1^(t/iters) decay). Round-5 at-scale A/B "
                   "(800^2/50 views): the reference horizon BEATS the "
                   "retired lr_fast 2/3 horizon (36.64 vs 36.14 dB) when "
                   "occupancy maintenance runs to 30k (also the default "
                   "again); RESULTS.md round-5 ledger")
    p.add_argument("--ckpt", type=str, default="latest")
    p.add_argument("--num_rays", type=int, default=4096)
    p.add_argument("--cuda_ray", action="store_true",
                   help="occupancy-grid fast path (name kept for parity)")
    p.add_argument("--max_steps", type=int, default=1024)
    p.add_argument("--num_steps", type=int, default=512)
    p.add_argument("--upsample_steps", type=int, default=0)
    p.add_argument("--update_extra_interval", type=int, default=16)
    p.add_argument("--max_ray_batch", type=int, default=4096)
    p.add_argument("--samples_per_ray", type=int, default=64,
                   help="static per-ray sample budget of the grid fast path")
    # model
    p.add_argument("--fp16", action="store_true", help="bf16 MLP compute on TPU")
    p.add_argument("--grid_levels", type=int, default=None,
                   help="hash-grid levels (default: 16 reference-exact, or "
                   "4 under -O — fewer x wider measured faster AND higher "
                   "PSNR on TPU, benchmarks/RESULTS.md)")
    p.add_argument("--grid_level_dim", type=int, default=None,
                   help="features per level (default: 2, or 8 under -O)")
    p.add_argument("--grid_hashmap_log2", type=int, default=None,
                   help="log2 max table rows per level (default: 19, or 17 "
                   "under -O)")
    p.add_argument("--grid_layout", type=str, default=None,
                   choices=["corner", "cell"],
                   help="table layout: corner = reference-exact vertex "
                   "hashing (default); cell = TPU-fast one-wide-gather-per-"
                   "level (default under -O)")
    p.add_argument("--grid_max_resolution", type=int, default=2048,
                   help="finest hash level resolution per unit bound "
                   "(desired_resolution = this * bound; reference "
                   "network.py:31 hardcodes 2048). Match a checkpoint "
                   "imported with a nonstandard --desired_resolution")
    p.add_argument("--grid_coord_convention", type=str, default="vertex",
                   choices=["vertex", "ngp"],
                   help="hash-lattice convention: vertex (native) or ngp "
                   "(reference CUDA kernel — REQUIRED when loading a "
                   "checkpoint imported from torch-ngp via "
                   "scripts/import_torch_ckpt.py)")
    p.add_argument("--grid_backward", type=str, default="xla",
                   choices=["xla", "sort"],
                   help="hash-table gradient strategy: xla scatter-add "
                   "(default) or sorted segment-sum (the TPU analogue of the "
                   "reference's atomicAdd backward, gridencoder.cu:299-312)")
    p.add_argument("--eval_table_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="hash-table dtype for eval/test/GUI rendering "
                   "(training masters stay fp32); bfloat16 (default) halves "
                   "gathered table bytes (+17%% chip A/B) and is quality-"
                   "free on converged scenes "
                   "(benchmarks/eval_table_dtype.py: -0.0003 dB)")
    p.add_argument("--eval_scan", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="whole-frame scan dispatch for eval/test/GUI "
                   "rendering: one jitted lax.map program over all chunks "
                   "instead of a per-chunk dispatch loop (default ON, +17%% "
                   "chip A/B)")
    p.add_argument("--eval_occ_ladder", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="occupancy-derived phase-A ladder shrink for "
                   "eval/test/GUI rendering (plan_occupied_ladder; default "
                   "ON, +33%% chip A/B), planned once per occupancy version")
    p.add_argument("--eval_frame_phase_a", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="frame-level phase-A split for eval/test/GUI scan "
                   "rendering: one frame-wide coarse march feeds every "
                   "chunk precomputed segments (rounds path, dt_gamma 0 "
                   "only; round-5 attribution — default pending chip A/B)")
    p.add_argument("--eval_coarse_segments", type=int, default=12,
                   help="render-only phase-A segment budget for eval/test/"
                   "GUI (training keeps --coarse_segments); 12 is quality-"
                   "neutral on converged grids and ~18%% faster; 0 = same "
                   "as training")
    p.add_argument("--eval_coarse_anchors", type=int, default=2,
                   help="render-only anchors per phase-A run for eval/test/"
                   "GUI; 0 = same as training")
    p.add_argument("--eval_first_k", action="store_true",
                   help="render-only first-K compaction (the reference's "
                   "consecutive-from-near inference semantics); default off "
                   "pending the 30k quality gate (eval_trims_30k)")
    p.add_argument("--eval_proxy", action="store_true",
                   help="render-only segment-proxy occlusion termination "
                   "in the march; default off pending the 30k quality gate")
    p.add_argument("--eval_beam", type=int, default=0,
                   help="render-only beam-shared phase A: this many "
                   "consecutive tile-ordered rays share one coarse march "
                   "against a 1-cell-dilated coarse table "
                   "(TrainerOptions.eval_beam; 0 = the TrainerOptions "
                   "default). Conservative by construction; chip round-4: "
                   "beam 8 = +13%% render throughput")
    p.add_argument("--ff", action="store_true", help="fused-MLP backend")
    p.add_argument("--tcnn", action="store_true",
                   help="reference-script compatibility flag: tinycudann is "
                   "a CUDA-only external library, so there is no tcnn "
                   "backend on TPU — this selects the Pallas fused-MLP "
                   "backend (same architecture and checkpoints as --ff) "
                   "and says so loudly at startup. The two-backend "
                   "decision is documented in docs/MIGRATION.md")
    # dataset
    p.add_argument("--color_space", type=str, default="srgb")
    p.add_argument("--preload", action="store_true")
    p.add_argument("--bound", type=float, default=2.0)
    p.add_argument("--scale", type=float, default=0.33)
    p.add_argument("--offset", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--dt_gamma", type=float, default=None,
                   help="adaptive stepping dt = clamp(t*dt_gamma, ...); "
                   "default 1/128 (reference main_nerf.py:47), or 0 under "
                   "-O. Nonzero runs the block marcher's static gamma "
                   "ladder (longer phase-A ladder than dt_gamma=0; "
                   "uniform-step marching remains the fastest)")
    p.add_argument("--min_near", type=float, default=0.2)
    p.add_argument("--stride_phase", type=str, default="random",
                   choices=["random", "ray_hash"],
                   help="training-march overflow-stride phase: random "
                   "(per-step stratified) or ray_hash (deterministic per "
                   "ray; candidate fix for late-schedule drift under the "
                   "reference lr decay)")
    p.add_argument("--coarse_segments", type=int, default=16,
                   help="phase-A occupied segments kept per ray (march "
                   "budget; 12 is quality-neutral on converged grids and "
                   "~18%% faster — benchmarks/RESULTS.md converged trim A/B)")
    p.add_argument("--coarse_anchors", type=int, default=3,
                   help="anchor gathers per phase-A run (2 is ~free on "
                   "converged grids)")
    p.add_argument("--density_thresh", type=float, default=10.0)
    p.add_argument("--grid_size", type=int, default=128,
                   help="occupancy grid resolution per cascade "
                   "(reference renderer.py:73)")
    p.add_argument("--bg_radius", type=float, default=-1.0)
    p.add_argument("--downscale", type=int, default=1)
    # experimental / gui / clip (parity)
    p.add_argument("--error_map", action="store_true")
    p.add_argument("--rand_pose", type=int, default=-1)
    p.add_argument("--clip_text", type=str, default="")
    p.add_argument("--clip_weights", type=str, default=None,
                   help="saved CLIPModel state_dict for the native JAX "
                   "vision tower (training/clip_jax.py documents the "
                   "one-liner that produces it)")
    p.add_argument("--clip_text_embed", type=str, default=None,
                   help=".npy precomputed text embedding paired with "
                   "--clip_weights (the text tower runs once, offline)")
    p.add_argument("--gui", action="store_true")
    p.add_argument("--W", type=int, default=1920)
    p.add_argument("--H", type=int, default=1080)
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--fovy", type=float, default=50.0)
    p.add_argument("--max_spp", type=int, default=64)
    return p


def _select_mlp_backend(opt, for_nav: bool) -> str:
    """--ff / --tcnn backbone selection (reference main_nerf.py:71-80).

    TPU has exactly TWO MLP backends — "xla" (jnp dot chain) and "fused"
    (Pallas VMEM-resident kernel, ops/fused_mlp.py). The reference's third
    backend, tinycudann (network_tcnn.py), is an external CUDA library with
    no TPU equivalent; --tcnn is accepted so reference launch scripts keep
    working, but the remap is LOUD, not silent (round-4 verdict item 10).
    Nav forces the xla chain: the Pallas kernel's custom_vjp is
    reverse-mode-only and the LM pose filter linearizes forward-mode (same
    math either way — checkpoints are backend-agnostic)."""
    if getattr(opt, "tcnn", False):
        import sys

        print("[flags] --tcnn: tinycudann is CUDA-only; running the Pallas "
              "fused-MLP backend instead (same architecture/checkpoints as "
              "--ff; see docs/MIGRATION.md)", file=sys.stderr)
    return "fused" if (opt.ff or opt.tcnn) and not for_nav else "xla"


def make_configs(opt, for_nav: bool = False):
    """Expand flags (incl. -O) into the framework config objects."""
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig

    if opt.O:
        opt.fp16 = True
        if for_nav:
            opt.cuda_ray = False  # nav needs the differentiable path
            opt.preload = False
        else:
            opt.cuda_ray = True
            opt.preload = True
    # grid architecture: reference-exact unless -O picks the TPU flagship
    # (cell 4x8 @ 2^17 — trains ~3x faster AND scores higher at scale than
    # the reference-exact corner 16x2 @ 2^19; chip-measured, RESULTS.md).
    # Explicit --grid_* flags always win; train and simulate must agree so
    # checkpoints load (both entry points share this resolution).
    flagship = bool(opt.O)
    if opt.grid_levels is None:
        opt.grid_levels = 4 if flagship else 16
    if opt.grid_level_dim is None:
        opt.grid_level_dim = 8 if flagship else 2
    if opt.grid_hashmap_log2 is None:
        opt.grid_hashmap_log2 = 17 if flagship else 19
    if opt.grid_layout is None:
        opt.grid_layout = "cell" if flagship else "corner"

    cfg = NetworkConfig(
        bound=opt.bound,
        bg_radius=opt.bg_radius,
        mlp_dtype="bfloat16" if opt.fp16 else "float32",
        mlp_backend=_select_mlp_backend(opt, for_nav),
        grid_levels=opt.grid_levels,
        grid_level_dim=opt.grid_level_dim,
        grid_log2_hashmap_size=opt.grid_hashmap_log2,
        grid_layout=opt.grid_layout,
        grid_max_resolution=opt.grid_max_resolution,
        grid_coord_convention=opt.grid_coord_convention,
        # nav never trains tables, and the sorted-scatter backward is a
        # reverse-mode-only custom_vjp that would block the LM filter's
        # forward-mode jax.linearize — force the plain gather there.
        grid_backward="xla" if for_nav else opt.grid_backward,
    )
    rcfg = RenderConfig(
        num_steps=opt.num_steps,
        upsample_steps=opt.upsample_steps,
        min_near=opt.min_near,
        max_ray_batch=opt.max_ray_batch,
    )
    # -O means "recommended fast settings": that includes dt_gamma=0 so the
    # grid path hits the two-phase/block marchers. An explicit nonzero
    # --dt_gamma is honored but WARNS that it drops the march to the slow
    # single-phase ladder (reference semantics, raymarching.cu:347-369).
    if opt.dt_gamma is None:
        opt.dt_gamma = 0.0 if opt.O else 1 / 128
    if opt.cuda_ray and opt.dt_gamma != 0.0:
        import warnings

        warnings.warn(
            f"dt_gamma={opt.dt_gamma}: the block marcher runs its static "
            "gamma ladder (longer phase A than uniform stepping; pass "
            "--dt_gamma 0 or -O for peak throughput).",
            stacklevel=2,
        )
    occ_cfg = march_cfg = None
    if opt.cuda_ray:
        occ_cfg = OccupancyConfig(
            bound=opt.bound, density_thresh=opt.density_thresh,
            min_near=opt.min_near, grid_size=opt.grid_size,
        )
        march_cfg = MarchConfig(
            bound=opt.bound, max_steps=opt.max_steps,
            samples_per_ray=opt.samples_per_ray, dt_gamma=opt.dt_gamma,
            min_near=opt.min_near, grid_size=opt.grid_size,
            coarse_segments=opt.coarse_segments,
            coarse_anchors=opt.coarse_anchors,
        )
    return cfg, rcfg, occ_cfg, march_cfg
