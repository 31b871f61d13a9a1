"""Training runtime: the Trainer.

Capability parity: reference nerf/utils.py:257-1059 (`Trainer`) —
  * Adam(0.9, 0.99, eps=1e-15) + LambdaLR 0.1^(step/iters) (main_nerf.py:126-135)
  * EMA of params, decay 0.95 (utils.py:324-327)
  * per-step random/fixed background augmentation for RGBA gt (433-444)
  * error-map-driven ray importance sampling with EMA update (457-478)
  * per-epoch checkpoints (full/best/rolling, 938-998) + resume (1000-1060)
  * evaluate with PSNR + validation image dumps (838-930), test -> mp4 (588-636)
  * tensorboard scalars + console/file logging (393-400, 804-806)
  * occupancy-grid maintenance hook every 16 steps (777-779) once the fast
    marching path is enabled (models/occupancy.py)

TPU-native design: ONE jitted train step does everything device-side — image
gather, ray sampling, rendering, loss, Adam update, EMA update, error-map
scatter — host only schedules indices and logs a scalar. Mixed precision is
bf16 (TPU-native) instead of fp16 GradScaler: params fp32, MLP compute bf16
via NetworkConfig.mlp_dtype; no loss scaling needed for bf16.
"""

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfnav_tpu.data.rays import get_rays, get_all_rays
from nerfnav_tpu.models import (
    NetworkConfig,
    RenderConfig,
    init_network,
    make_field,
    render_rays,
)
from nerfnav_tpu.training import checkpoint as ckpt_lib
from nerfnav_tpu.training.metrics import PSNRMeter


@dataclass
class TrainerOptions:
    name: str = "ngp"
    workspace: str = "workspace"
    lr: float = 1e-2
    iters: int = 30000            # lr decays 0.1^(step/lr_horizon)
    # lr-horizon override: 0 = `iters` — REFERENCE PARITY (0.1^(t/iters),
    # main_nerf.py:23-26). Round 2-3 shipped a 2/3 horizon as a drift
    # workaround; round 4 closes the loop: with the occ_freeze_after
    # default ON (the measured full mitigation), the reference schedule
    # holds >= 28 dB at 30k (drift occ_freeze arm: freeze@6k, lr_iters =
    # 30000), so the silent schedule swap is retired. Pass
    # lr_iters = 2*iters//3 for the old behavior.
    # `iters` also anchors the fractional dt-anneal thresholds below, so an
    # lr-schedule A/B must vary THIS knob to leave the marching schedule fixed
    lr_iters: int = 0
    num_rays: int = 4096
    eval_interval: int = 50
    max_keep_ckpt: int = 2
    ema_decay: float = 0.95
    bg_train: str = "random"      # "random" | "white" | "black"
    use_checkpoint: str = "latest"  # latest | best | scratch | <path>
    error_map: bool = False
    update_extra_interval: int = 16
    # Train steps fused per device dispatch via lax.scan (train_bench
    # --scan_steps): each host iteration launches ONE program running k
    # steps back-to-back. Chunks never cross an occupancy-update or
    # dt-anneal boundary, so the step sequence is identical to the unfused
    # loop (bit-equal params, tests/test_trainer_e2e.py); error-map /
    # mean-count EMAs run inside the scan body unchanged. Default 1 (one
    # dispatch per step): the chip A/B KILLED the dispatch-fusion
    # hypothesis — scan_steps 4/8 = 44.4/45.2 steps/s vs 92.7 unfused
    # (RESULTS.md round-4) — the async dispatch pipeline already hides the
    # relay floor, and the scanned body loses XLA's cross-step scheduling.
    # Kept as an option for single-dispatch training contexts (dryruns,
    # remote relays without async dispatch). Not used in rand_pose mode.
    scan_steps: int = 1
    # Stop occupancy-grid maintenance after this step (fractions <= 1.0 are
    # of `iters`; 0 = never — REFERENCE PARITY, the default again since
    # round 5). History: the round 2-4 drift campaign measured the 30k
    # reference-lr schedule collapsing 28.4 -> 23.5 dB on the 128^2 / 24-
    # view probe scene, seven candidate root-cause fixes failed their arms
    # (RESULTS.md round-4/5 ledgers), and round 4 shipped freeze@0.2*iters
    # as the only mitigation that held. Round 5 then ran the AT-SCALE A/B
    # (800^2 / 50 views / 30k, the Stonehenge-class protocol): reference
    # maintenance to 30k holds 36.64 dB while the freeze LOSES 2.0 dB
    # (34.63) — the collapse is a small-scene pathology (few views x small
    # frames: the late lr chases per-view sampling noise the grid then
    # memorizes), not a property of the static-K design at its product
    # scale. Set ~0.2 for small/few-view scenes (the drift probe's regime);
    # leave 0 for reference-parity maintenance.
    occ_freeze_after: float = 0.0
    # Softer guard: past this step (fractions <= 1.0 are of `iters`), PIN the
    # carve threshold at its current value instead of freezing maintenance
    # outright — density updates and EMA-decay carving continue; only the
    # min(mean_density, density_thresh) RATCHET stops. Round-4 chip verdict:
    # the ratchet hypothesis is DEAD — the thresh_freeze drift arm is
    # bitwise identical to control (the bar was already pinned at
    # density_thresh on the probe scene), so this knob does not address the
    # 30k reference-schedule collapse (occ_freeze remains the only full
    # mitigation; see benchmarks/RESULTS.md round 4). Kept as a diagnostic.
    # 0 = off.
    occ_thresh_freeze_after: float = 0.0
    seed: int = 0
    tensorboard: bool = False
    # eval/test/GUI rendering uses the early-termination rounds renderer
    # over tile-ordered chunks (the reference inference loop's alive-ray
    # retirement, renderer.py:325-374; chip A/B +21% over single-shot).
    # Training steps are untouched (gradients want the single-shot shade).
    # NOTE: the rounds renderer's all-dead early exit couples rays within a
    # chunk, so pixel values in the T<1e-4 tail depend on chunk size / tile
    # layout — PSNR is reproducible only with eval_rounds AND
    # max_ray_batch/tile settings held fixed; compare metrics across configs
    # with eval_rounds pinned.
    eval_rounds: bool = True
    # hash-gather issue order inside the rounds shading: "ray" (default) or
    # "depth" (cross-ray spatial coherence — adjacent rays at the same depth
    # gather near-identical table rows; bench.py --shade_order A/B)
    shade_order: str = "ray"
    # Whole-frame scan dispatch for render_full: ONE jitted lax.map program
    # over every stacked chunk instead of a host loop of per-chunk dispatches
    # (each costs ~0.4 ms through the remote-dispatch relay; bench.py --scan
    # A/B). The rounds early-exit conds still fire per chunk inside the map.
    # Default ON (+17% chip A/B at chunk 4096, +38% over the round-2 start;
    # RESULTS.md queue-10 table): the product render path runs the same
    # program shape the bench measures.
    eval_scan: bool = True
    # Frame-level phase-A split for the scan renderer (round 5): run the
    # coarse march ONCE at frame width and feed every chunk precomputed
    # segments. MEASURED WORSE on chip (1.74M vs the fused 3.94M rays/s,
    # RESULTS.md round 5): the fused scan overlaps chunk i's march with
    # chunk i-1's shading across the dispatch pipeline, while the split
    # serializes the frame behind one phase-A barrier — utilization lost
    # to pipelining, the same verdict as the sequence renderer. Kept as a
    # parity-tested A/B control; rounds path, dt_gamma == 0 only.
    eval_frame_phase_a: bool = False
    # Occupancy-derived phase-A ladder shrink for eval/test/GUI rendering
    # (ops/marching.plan_occupied_ladder): bound the static phase-A ladder by
    # the worst-case cube-entry -> occupied-AABB-exit span, planned ONCE per
    # occupancy version on the host (a bitfield unpack + argwhere) and cached.
    # +33% chip A/B (3.21M vs 2.42M rays/s — the plan lands the ladder on the
    # 8-anchor-run compile-shape optimum, RESULTS.md ladder-cliff table).
    # Training marches are untouched (they use the fixed ladder). A changed
    # plan compiles a new render program; t_a0 is quantized to whole anchor
    # runs to bound program churn.
    eval_occ_ladder: bool = True
    # Eval/test/GUI march trims (render-only; the training march keeps the
    # MarchConfig values): phase-A segment budget + anchors per run. On a
    # CONVERGED grid seg12/anch2 is quality-neutral (26.69 vs 26.73 dB on the
    # 30k checkpoint) and ~25% faster; mid-training (fat grid) it can cost
    # ~0.3 dB of eval PSNR — a progress-signal tradeoff, not a training one.
    # 0 = keep the MarchConfig value.
    eval_coarse_segments: int = 12
    eval_coarse_anchors: int = 2
    # Render-only converged-scene sample shaving (round-4 candidates,
    # default OFF pending the 30k-checkpoint quality gate,
    # benchmarks/eval_trims_30k.py --set firstk_proxy): first-K compaction
    # (the reference's consecutive-from-near inference semantics,
    # raymarching.cu:707-825) and segment-proxy occlusion termination in
    # the march. Training marches are untouched either way.
    eval_first_k: bool = False
    eval_proxy: bool = False
    # Eval-only beam-shared phase A (MarchConfig.beam): groups of
    # consecutive tile-ordered rays share one coarse march against a
    # 1-cell-dilated coarse table. Sound here because eval renders in
    # row-major 64-tiles (_tile_layout), so members are pixel-adjacent;
    # training keeps beam=1 (random ray batches are not coherent).
    # 0 = AUTO (default): per-frame, the largest power-of-two width whose
    # member spread stays under one coarse cell (Trainer._auto_beam from
    # the frame's focal) — 8 at the flagship 800^2/f800 (chip +13.1%,
    # RESULTS.md round-4 queue 7), 2 at a 128^2 wide-FOV probe frame,
    # 1 whenever the contract cannot be met. Explicit 1 = off, >1 = fixed.
    eval_beam: int = 0
    # Coarse-to-fine marching-step annealing for the grid fast path:
    # ((threshold, dt_multiplier), ...) — marching starts coarse (the static
    # budget then spans every ray without field-dependent stride, which
    # otherwise couples rendering opacity to the learned occupancy and
    # inflates density over long runs) and refines on a FIXED schedule.
    # Thresholds <= 1.0 are fractions of `iters`; > 1 are absolute steps.
    dt_anneal: tuple = ((0.0, 8), (0.05, 4), (0.1, 2), (0.2, 1))
    # Global point-budget compaction for the grid train path (the reference's
    # mean_count EMA + ray-drop, renderer.py:283-288, raymarching.py:198-203):
    # the jitted step tracks an EMA of marched-sample counts; the trainer
    # picks the smallest budget bucket covering margin * EMA and shades only
    # that many packed samples (renderer _shade_packed). Each bucket is one
    # compiled program. Dead slots otherwise dominate training backward cost
    # (hash-table scatter rows). Under a device mesh the packing runs in
    # per-shard groups (sample_groups = n_devices): each shard packs into
    # budget/n slots locally, so no collective rides the cumsums — the
    # reference's global mean_count ray-drop becomes a per-shard ray-drop.
    point_budget: bool = True
    point_budget_fracs: tuple = (0.125, 0.25, 0.375, 0.5, 0.625, 0.75)
    point_budget_margin: float = 1.15
    # Overflow-stride phase source for the training march (MarchConfig.
    # stride_phase): "random" = stratified per step (round-1/2 behavior);
    # "ray_hash" = deterministic per ray — the round-3 candidate fix for the
    # late-schedule drift (the reference lr schedule collapses when late-run
    # updates chase per-step lattice noise; see MarchConfig.stride_phase).
    # Gated on the chip drift probe (benchmarks/drift_probe.py --phase arm).
    stride_phase: str = "random"
    # Poseless / text-guided training (reference --rand_pose + --clip_text,
    # utils.py:381-424, provider.py:282-296): rand_pose == 0 trains from
    # random orbit poses ONLY (pure similarity loss); > 0 is hybrid — one
    # similarity batch per rand_pose supervised batches. A similarity batch
    # renders a low-res full frame (sqrt(H*W/num_rays) downscale, white bg)
    # and minimizes Trainer.clip_loss_fn on it.
    rand_pose: int = -1
    clip_text: str = ""
    rand_pose_radius: float = 1.0
    # Hash-table storage dtype for eval/test/GUI rendering: "bfloat16" halves
    # the gathered table bytes (training always keeps fp32 masters; the cast
    # is applied once per params version in render_full). Quality-free on
    # converged scenes: 26.7038 -> 26.7035 dB on the 30k cluttered checkpoint
    # (benchmarks/eval_table_dtype.py) and +17% render throughput (chip A/B,
    # RESULTS.md queue-1 table) — default ON so the product path matches the
    # bench; pass "float32" for bit-exact fp32 eval.
    eval_table_dtype: str = "bfloat16"


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    ema_params: dict
    global_step: jnp.ndarray           # scalar int32
    error_maps: Optional[jnp.ndarray]  # (n_images, 128*128) or None
    occupancy: Optional[dict] = None   # occupancy-grid state (stage: fast path)
    # EMA of total valid marched samples per step (reference step_counter /
    # mean_count, renderer.py:96-101); device scalar, host-read every
    # update_extra_interval steps
    mean_count: Optional[jnp.ndarray] = None


class Trainer:
    def __init__(
        self,
        cfg: NetworkConfig,
        rcfg: RenderConfig,
        opt: TrainerOptions,
        params=None,
        occupancy_cfg=None,
        march_cfg=None,
        mesh=None,
        clip_loss_fn=None,
    ):
        """march_cfg + occupancy_cfg together enable the occupancy-grid fast
        path (the reference's `-O`/cuda_ray mode, main_nerf.py:66-69); without
        them training uses the dense differentiable path.

        mesh: optional jax.sharding.Mesh — rays are sharded across its "data"
        axis inside the jitted step (data parallelism; replaces the
        reference's vestigial DDP, utils.py:267-268, 305-307).

        clip_loss_fn: optional jax-differentiable callable
        (image (h, w, 3) in [0,1]) -> scalar loss, used by the poseless
        rand_pose mode (reference CLIPLoss, nerf/clip_utils.py). Gradient-
        based CLIP needs JAX-converted pretrained weights, which this offline
        image cannot fetch — pass a stub/custom scorer; with
        opt.clip_text set and no fn, construction fails loudly."""
        self.cfg = cfg
        self.rcfg = rcfg
        self.opt = opt
        self.occupancy_cfg = occupancy_cfg
        self.march_cfg = march_cfg
        self.mesh = mesh
        if march_cfg is not None and occupancy_cfg is None:
            raise ValueError("march_cfg requires occupancy_cfg")
        if mesh is not None and opt.num_rays % mesh.devices.size != 0:
            raise ValueError(
                f"num_rays ({opt.num_rays}) must divide evenly across "
                f"{mesh.devices.size} devices"
            )
        self.clip_loss_fn = clip_loss_fn
        if opt.rand_pose >= 0 and clip_loss_fn is None:
            raise RuntimeError(
                "rand_pose mode needs a jax-differentiable clip_loss_fn "
                "(training/clip_jax.py make_clip_loss_fn with user-supplied "
                "pretrained weights; they cannot be fetched in this offline "
                "environment). Inject a stub or JAX CLIP tower."
            )
        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": [], "results": [], "best_result": None}

        key = jax.random.PRNGKey(opt.seed)
        self.key, init_key = jax.random.split(key)
        if params is None:
            params = init_network(init_key, cfg)
        self.params = params

        lr_horizon = opt.lr_iters or max(1, opt.iters)
        schedule = lambda step: opt.lr * (0.1 ** (step / lr_horizon))  # noqa: E731
        self.optimizer = optax.adam(schedule, b1=0.9, b2=0.99, eps=1e-15)

        self.workspace = opt.workspace
        os.makedirs(self.workspace, exist_ok=True)
        self.ckpt_dir = os.path.join(self.workspace, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.log_path = os.path.join(self.workspace, f"log_{opt.name}.txt")
        self.writer = None
        if opt.tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(self.workspace, "run", opt.name))
            except ImportError:
                self.log("tensorboardX unavailable; scalars not written")

        self._train_step_fns = {}  # (H, W, C, dt_mult, budget) -> jitted step
        self._pinned_thresh = None  # occ_thresh_freeze_after carve-bar pin
        self._render_chunk_fns = {}    # t_a0 (0 = auto ladder) -> chunk fn
        self._render_scan_fns = {}     # t_a0 -> whole-frame scan fn
        self._table_cast_cache = None  # (params, cast_params) for eval dtype
        self._occ_version = 0          # bumped on every occupancy replace
        self._ladder_plan = None       # (occ_version, t_a0) occ-ladder cache
        self._tile_layouts = {}        # (H, W, chunk) -> tile-major layout
        self._mean_count_host = 0.0  # host mirror of state.mean_count
        self.state = None  # built on first train()/resume

    # ------------------------------------------------------------------ utils
    def log(self, *msg):
        text = " ".join(str(m) for m in msg)
        print(f"[{self.opt.name}] {text}")
        with open(self.log_path, "a") as f:
            f.write(text + "\n")

    def _init_state(self, n_images: int) -> TrainState:
        opt_state = self.optimizer.init(self.params)
        emaps = (
            jnp.full((n_images, 128 * 128), 0.1, jnp.float32)
            if self.opt.error_map
            else None
        )
        occ = None
        if self.occupancy_cfg is not None:
            from nerfnav_tpu.models.occupancy import init_occupancy_state

            occ = init_occupancy_state(self.occupancy_cfg)
        return TrainState(
            params=self.params,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), self.params),
            global_step=jnp.asarray(0, jnp.int32),
            error_maps=emaps,
            occupancy=occ,
            mean_count=(jnp.asarray(0.0, jnp.float32)
                        if self.march_cfg is not None else None),
        )

    def reset_model(self):
        """Reinitialize weights + occupancy/extra state — the GUI's reset
        button (reference gui.py:215-228: weight_reset over the modules +
        model.reset_extra_state)."""
        self.key, init_key = jax.random.split(self.key)
        self.params = init_network(init_key, self.cfg)
        if self.state is not None:
            n_images = (self.state.error_maps.shape[0]
                        if self.state.error_maps is not None else 1)
            self.state = self._init_state(n_images)
            self._occ_version += 1
        # else: leave state None — train() sizes it from the dataset, so a
        # pre-training reset can't pin error_maps to the wrong image count
        self.epoch = 0
        self.global_step = 0
        self._mean_count_host = 0.0
        self._table_cast_cache = None
        self.stats = {"loss": [], "valid_loss": [], "results": [],
                      "best_result": None}

    # ------------------------------------------------------------- train step
    def _step_fn(self, H, W, C, scan_steps: int = 1):
        """Jitted train step for the current anneal phase + point budget
        (cached per (shape, dt_mult, budget, scan) — a handful of programs)."""
        key = (H, W, C, self._dt_mult(), self._current_budget(), scan_steps)
        if key not in self._train_step_fns:
            self._train_step_fns[key] = self._build_train_step(*key)
        return self._train_step_fns[key]

    def _steps_to_phase_boundary(self) -> int:
        """Steps until the next occupancy-update or dt-anneal boundary — the
        max scan chunk that keeps the fused loop step-identical to the
        per-step loop (program rebuilds happen only at these boundaries)."""
        interval = self.opt.update_extra_interval
        dist = interval - (self.global_step % interval)
        for threshold, _ in self.opt.dt_anneal:
            if threshold <= 1.0:
                threshold = threshold * self.opt.iters
            if self.global_step < threshold:
                dist = min(dist, int(threshold) - self.global_step)
        return max(dist, 1)

    def _current_budget(self) -> int | None:
        """Static sample budget for the packed train shade, from the host
        mirror of the mean-count EMA (reference mean_count, renderer.py:283-288).
        None = shade the full (N, K) lattice (early training). Under a mesh
        the budget is rounded to a multiple of the device count (the packed
        shade runs in per-shard groups)."""
        if (self.march_cfg is None
                or not self.opt.point_budget or self._mean_count_host <= 0):
            return None
        nk = self.opt.num_rays * self.march_cfg.samples_per_ray
        groups = self.mesh.devices.size if self.mesh is not None else 1
        required = self.opt.point_budget_margin * self._mean_count_host
        for frac in sorted(self.opt.point_budget_fracs):
            if frac * nk >= required and frac < 1.0:
                b = int(frac * nk)
                return max(b - b % groups, groups)
        return None

    def _dt_mult(self) -> int:
        """Current marching dt multiplier from the anneal schedule."""
        if self.march_cfg is None:
            return 1
        mult = 1
        for threshold, m in self.opt.dt_anneal:
            if threshold <= 1.0:
                threshold = threshold * self.opt.iters
            if self.global_step >= threshold:
                mult = m
        return mult

    def _build_train_step(self, H, W, C, dt_mult: int = 1,
                          sample_budget: int | None = None,
                          scan_steps: int = 1):
        cfg, rcfg, opt = self.cfg, self.rcfg, self.opt
        optimizer = self.optimizer
        mcfg = self.march_cfg
        if mcfg is not None:
            import dataclasses

            # training always marches the reference-exact fixed ladder: the
            # normalized per-ray ladder (ops/marching.py _phase_a_ladder) is
            # an INFERENCE optimization — coupling the sampling pitch to ray
            # length during training costs ~2 dB on the at-scale quality
            # harness (chip-measured A/B, benchmarks/RESULTS.md), while at
            # eval time it costs 0.1 dB and buys ~25% render throughput.
            # proxy_terminate is likewise inference-only: the EMA grid
            # overestimates density early in training (it keeps the max seen
            # per cell) and would occlusion-mask samples the field still
            # needs gradient from.
            mcfg = dataclasses.replace(
                mcfg,
                coarse_normalized=False,
                proxy_terminate=False,
                stride_phase=opt.stride_phase,
                max_steps=(
                    max(mcfg.max_steps // dt_mult, 8) if dt_mult > 1
                    else mcfg.max_steps
                ),
            )
        mesh = self.mesh

        def train_step(state: TrainState, arrays, idx, key):
            pose = arrays["poses"][idx]
            image = arrays["images"][idx].astype(jnp.float32)  # (H, W, C)
            intr = arrays["intrinsics"]
            k_ray, k_perturb, k_bg = jax.random.split(key, 3)

            emap = None if state.error_maps is None else state.error_maps[idx]
            rays = get_rays(pose, intr, H, W, opt.num_rays, k_ray, emap)
            gt = image.reshape(H * W, C)[rays["inds"]]  # (n, C)
            if mesh is not None:
                # shard rays + targets over the data axis: XLA SPMD splits
                # the render/MLP across devices and psums grads over ICI
                from nerfnav_tpu.parallel.sharding import shard_rays

                rays = {**rays, **shard_rays(
                    {"rays_o": rays["rays_o"], "rays_d": rays["rays_d"]}, mesh
                )}
                gt = shard_rays(gt, mesh)

            if opt.bg_train == "random":
                bg = jax.random.uniform(k_bg, (opt.num_rays, 3))
            elif opt.bg_train == "white":
                bg = jnp.ones((opt.num_rays, 3))
            else:
                bg = jnp.zeros((opt.num_rays, 3))
            if C == 4:
                gt_rgb = gt[:, :3] * gt[:, 3:] + bg * (1.0 - gt[:, 3:])
            else:
                gt_rgb = gt

            def loss_fn(p):
                if mcfg is not None:
                    from nerfnav_tpu.models import render_rays_grid

                    out = render_rays_grid(
                        make_field(p, cfg), state.occupancy, mcfg,
                        rays["rays_o"], rays["rays_d"], key=k_perturb,
                        bg_color=bg, sample_budget=sample_budget,
                        sample_groups=(mesh.devices.size
                                       if mesh is not None else 1),
                    )
                else:
                    out = render_rays(
                        make_field(p, cfg), rcfg, rays["rays_o"], rays["rays_d"],
                        key=k_perturb, bg_color=bg,
                    )
                per_ray = jnp.mean((out["image"] - gt_rgb) ** 2, axis=-1)
                return jnp.mean(per_ray), (per_ray, out.get("n_samples"))

            (loss, (per_ray, n_samples)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            d = opt.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params
            )

            emaps = state.error_maps
            if emaps is not None:
                # EMA update of the coarse error bins hit this step
                # (reference utils.py:457-478)
                j, i = rays["inds"] // W, rays["inds"] % W
                coarse = (j * 128 // H) * 128 + (i * 128 // W)
                old = emaps[idx, coarse]
                emaps = emaps.at[idx, coarse].set(0.9 * old + 0.1 * per_ray)

            mean_count = state.mean_count
            if mean_count is not None and n_samples is not None:
                ns = n_samples.astype(jnp.float32)
                # warm-start the EMA on the first step (reference fills its
                # 16-slot step_counter before averaging)
                mean_count = jnp.where(
                    mean_count <= 0.0, ns, 0.9 * mean_count + 0.1 * ns
                )

            new_state = TrainState(
                params=params,
                opt_state=opt_state,
                ema_params=ema,
                global_step=state.global_step + 1,
                error_maps=emaps,
                occupancy=state.occupancy,
                mean_count=mean_count,
            )
            return new_state, loss

        if scan_steps > 1:
            # fuse k steps into one dispatched program; (idxs, keys) are
            # (k,)-leading stacks and the result carries the per-step losses
            def scan_step(state: TrainState, arrays, idxs, keys):
                def body(st, xk):
                    return train_step(st, arrays, xk[0], xk[1])

                return jax.lax.scan(body, state, (idxs, keys))

            return jax.jit(scan_step, donate_argnums=(0,))

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_clip_step(self, rH, rW):
        """Jitted poseless training step (reference train_step CLIP branch,
        utils.py:404-424): render a low-res full frame from a random orbit
        pose (white bg, perturb) and descend clip_loss_fn on it."""
        cfg, rcfg, opt = self.cfg, self.rcfg, self.opt
        optimizer = self.optimizer
        mcfg = self.march_cfg
        clip_loss_fn = self.clip_loss_fn

        def clip_step(state: TrainState, pose, intr, key):
            rays = get_all_rays(pose, intr, rH, rW)

            def loss_fn(p):
                if mcfg is not None:
                    from nerfnav_tpu.models import render_rays_grid

                    out = render_rays_grid(
                        make_field(p, cfg), state.occupancy, mcfg,
                        rays["rays_o"], rays["rays_d"], key=key, bg_color=1.0,
                    )
                else:
                    out = render_rays(
                        make_field(p, cfg), rcfg, rays["rays_o"],
                        rays["rays_d"], key=key, bg_color=1.0,
                    )
                return clip_loss_fn(out["image"].reshape(rH, rW, 3))

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            d = opt.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params
            )
            new_state = state._replace(
                params=params, opt_state=opt_state, ema_params=ema,
                global_step=state.global_step + 1,
            )
            return new_state, loss

        return jax.jit(clip_step, donate_argnums=(0,))

    def _clip_step_fn(self, H, W):
        # low-res full frame with ~num_rays pixels (reference provider.py:287)
        s = float(np.sqrt(H * W / self.opt.num_rays))
        rH, rW = max(int(H / s), 1), max(int(W / s), 1)
        key = ("clip", rH, rW)
        if key not in self._train_step_fns:
            self._train_step_fns[key] = (self._build_clip_step(rH, rW), s)
        return self._train_step_fns[key]

    @staticmethod
    def _apply_ladder_plan(mcfg, plan):
        """Apply a _planned_ladder result to a MarchConfig: an int is a
        t_a0_steps override (gamma=0 normalized ladder), a float is a
        gamma_span bound (dt_gamma > 0 static gamma ladder). 0 = no plan."""
        if not plan or mcfg is None:
            return mcfg
        import dataclasses

        if isinstance(plan, float):
            return dataclasses.replace(mcfg, gamma_span=plan)
        return dataclasses.replace(mcfg, t_a0_steps=plan)

    def _eval_march_cfg(self):
        """The march config eval/test/GUI rendering uses: the training
        MarchConfig with the render-only trims applied
        (TrainerOptions.eval_coarse_segments / eval_coarse_anchors)."""
        mcfg = self.march_cfg
        if mcfg is None:
            return None
        import dataclasses

        seg = self.opt.eval_coarse_segments or mcfg.coarse_segments
        anch = self.opt.eval_coarse_anchors or mcfg.coarse_anchors
        fk = self.opt.eval_first_k or mcfg.first_k
        px = self.opt.eval_proxy or mcfg.proxy_terminate
        # opt.eval_beam is deliberately NOT baked here: the beam contract
        # (consecutive rays = adjacent pixels) only holds on render_full's
        # tile-ordered frames, and this base config also feeds the sequence
        # renderer and the untiled chunk path — beam is injected per call
        # site via _build_render_chunk's override (advisor round 4).
        if (seg, anch, fk, px) == (
                mcfg.coarse_segments, mcfg.coarse_anchors,
                mcfg.first_k, mcfg.proxy_terminate):
            return mcfg
        return dataclasses.replace(
            mcfg, coarse_segments=seg, coarse_anchors=anch,
            first_k=fk, proxy_terminate=px)

    def _build_render_chunk(self, t_a0: int | None = None,
                            beam: int | None = None):
        """The cached jitted eval chunk renderer.

        t_a0 overrides the static phase-A ladder length (occ-ladder plan);
        beam overrides the beam-shared phase-A width (render_full's AUTO
        rule — only passed for tile-ordered frames)."""
        cfg, rcfg = self.cfg, self.rcfg
        mcfg = self._eval_march_cfg()
        if beam and beam > 1 and mcfg is not None:
            import dataclasses as _dc

            mcfg = _dc.replace(mcfg, beam=beam)
        mesh = self.mesh
        if t_a0 is not None and not (mcfg is not None and self.opt.eval_rounds):
            raise ValueError("ladder overrides need the rounds eval path")

        def shard_in(ro, rd):
            # eval/render sharding over the data axis: XLA SPMD splits the
            # chunk render across devices (replaces the reference's NCCL
            # eval all_gather, utils.py:866-882); outputs are re-replicated
            if mesh is None:
                return ro, rd
            from nerfnav_tpu.parallel.sharding import shard_rays

            t = shard_rays({"ro": ro, "rd": rd}, mesh)
            return t["ro"], t["rd"]

        if mcfg is not None and self.opt.eval_rounds:
            from nerfnav_tpu.models import render_rays_grid_rounds

            shade_order = self.opt.shade_order
            mcfg_r = self._apply_ladder_plan(mcfg, t_a0)

            def core(params, occupancy, rays_o, rays_d, bg_color, crop_aabb,
                     z_window, phase_a=None):
                rays_o, rays_d = shard_in(rays_o, rays_d)
                return render_rays_grid_rounds(
                    make_field(params, cfg), occupancy, mcfg_r, rays_o,
                    rays_d, bg_color=bg_color, crop_aabb=crop_aabb,
                    shade_order=shade_order, z_window=z_window,
                    phase_a=phase_a,
                )

            @partial(jax.jit, static_argnums=(4,))
            def render_chunk(params, occupancy, rays_o, rays_d,
                             bg_color: float, crop_aabb=None):
                return core(params, occupancy, rays_o, rays_d, bg_color,
                            crop_aabb, None)

            # the scan renderer reuses this exact core + march config for
            # the frame-level phase-A split (TrainerOptions
            # eval_frame_phase_a)
            render_chunk._core = core
            render_chunk._mcfg_rounds = mcfg_r
        elif mcfg is not None:
            from nerfnav_tpu.models import render_rays_grid

            @partial(jax.jit, static_argnums=(4,))
            def render_chunk(params, occupancy, rays_o, rays_d, bg_color: float,
                             crop_aabb=None):
                rays_o, rays_d = shard_in(rays_o, rays_d)
                return render_rays_grid(
                    make_field(params, cfg), occupancy, mcfg, rays_o, rays_d,
                    bg_color=bg_color, crop_aabb=crop_aabb,
                )
        else:

            @partial(jax.jit, static_argnums=(4,))
            def render_chunk(params, bitfield, rays_o, rays_d, bg_color: float,
                             crop_aabb=None):
                rays_o, rays_d = shard_in(rays_o, rays_d)
                return render_rays(
                    make_field(params, cfg), rcfg, rays_o, rays_d,
                    bg_color=bg_color, crop_aabb=crop_aabb,
                )

        return render_chunk

    # ------------------------------------------------------------ public API
    def train(self, train_ds, valid_ds=None, max_epochs: int = 1,
              steps_per_epoch: int | None = None):
        """Reference Trainer.train (utils.py:557-584)."""
        arrays = train_ds.as_arrays()
        H, W = train_ds.H, train_ds.W
        C = arrays["images"].shape[-1]
        if self.state is None:
            self.state = self._init_state(len(train_ds))
            self._maybe_resume()
        if self.state.occupancy is not None:
            from nerfnav_tpu.models.occupancy import mark_untrained_grid

            self.state = self.state._replace(
                occupancy=mark_untrained_grid(
                    self.state.occupancy, self.occupancy_cfg,
                    arrays["poses"], arrays["intrinsics"], H, W,
                )
            )
            self._occ_version = getattr(self, "_occ_version", 0) + 1

        steps = steps_per_epoch or max(len(train_ds), 100)
        rng = np.random.default_rng(self.opt.seed + self.epoch)
        for _ in range(max_epochs):
            self.epoch += 1
            t0 = time.time()
            total = None
            s = 0
            while s < steps:
                self._maybe_update_occupancy()
                self.key, sub = jax.random.split(self.key)
                rp = self.opt.rand_pose
                if rp >= 0 and (rp == 0 or s % (rp + 1) == rp):
                    # poseless similarity batch (reference provider.py:280-296
                    # interleaving: one per rand_pose supervised batches;
                    # rand_pose == 0 -> every batch)
                    from nerfnav_tpu.data.provider import rand_poses

                    clip_fn, scale = self._clip_step_fn(H, W)
                    pose = jnp.asarray(
                        rand_poses(rng, 1, radius=self.opt.rand_pose_radius)[0]
                    )
                    self.state, loss = clip_fn(
                        self.state, pose, arrays["intrinsics"] / scale, sub
                    )
                    k = 1
                elif self.opt.scan_steps > 1 and rp < 0:
                    # fused dispatch: k steps in one program, chunk clipped to
                    # the next occupancy/anneal boundary so the step sequence
                    # matches the per-step loop exactly
                    k = min(self.opt.scan_steps, steps - s,
                            self._steps_to_phase_boundary())
                    idxs = jnp.asarray(
                        rng.integers(len(train_ds), size=k), jnp.int32)
                    self.state, losses = self._step_fn(H, W, C, k)(
                        self.state, arrays, idxs, jax.random.split(sub, k)
                    )
                    loss = losses[-1]
                else:
                    idx = int(rng.integers(len(train_ds)))
                    self.state, loss = self._step_fn(H, W, C)(
                        self.state, arrays, jnp.asarray(idx), sub
                    )
                    k = 1
                self.global_step += k
                s += k
                # accumulate on device: float(loss) every step would
                # host-sync and stall the async dispatch pipeline (the
                # reference's per-step loss.item() stall, utils.py:796) —
                # so the tensorboard scalar (reference utils.py:804-806 logs
                # per step) is fetched only on the occupancy-update cadence,
                # where the pipeline already synchronizes
                chunk = loss if k == 1 else jnp.sum(losses)
                total = chunk if total is None else total + chunk
                if (self.writer is not None and self.global_step
                        % self.opt.update_extra_interval == 0):
                    self.writer.add_scalar("train/loss", float(loss), self.global_step)
            avg = float(total) / steps
            self.stats["loss"].append(avg)
            self.log(
                f"epoch {self.epoch} | loss {avg:.6f} | "
                f"{steps / (time.time() - t0):.1f} steps/s"
            )
            self.save_checkpoint(full=True)
            if valid_ds is not None and self.epoch % self.opt.eval_interval == 0:
                self.evaluate(valid_ds)

    def _maybe_update_occupancy(self):
        if self.state.occupancy is None:
            return
        if self.global_step % self.opt.update_extra_interval != 0:
            return
        if self.state.mean_count is not None:
            # refresh the host budget mirror on the same cadence (this
            # boundary already synchronizes on the update counter); keep it
            # ahead of the freeze return — occ_freeze_after halts occupancy
            # CARVING only, not point-budget adaptation
            self._mean_count_host = float(self.state.mean_count)
        freeze_at = self.opt.occ_freeze_after
        if freeze_at == 1 and isinstance(freeze_at, int):
            # `1` is ambiguous under the fraction-if-<=1.0 rule: an int 1
            # reads as "freeze after step 1" but would silently become
            # 1.0*iters (never freeze during the run). Require 1.0 (the
            # whole-run fraction) or an explicit step count >= 2.
            raise ValueError(
                "occ_freeze_after=1 is ambiguous: pass 1.0 for the "
                "fraction form or an absolute step count >= 2")
        if 0 < freeze_at <= 1.0:
            freeze_at = freeze_at * self.opt.iters
        if freeze_at > 0 and self.global_step > freeze_at:
            return
        from nerfnav_tpu.models.occupancy import update_extra_state

        thresh_cap = None
        tfa = self.opt.occ_thresh_freeze_after
        if 0 < tfa <= 1.0:
            tfa = int(tfa * self.opt.iters)
        if tfa and self.global_step > tfa:
            if self._pinned_thresh is None:
                # pin at the CURRENT carve bar (one tiny host read on the
                # update cadence, which already synchronizes)
                self._pinned_thresh = float(jnp.minimum(
                    self.state.occupancy["mean_density"],
                    self.occupancy_cfg.density_thresh))
            thresh_cap = jnp.float32(self._pinned_thresh)

        self.key, sub = jax.random.split(self.key)
        self.state = self.state._replace(
            occupancy=update_extra_state(
                self.state.occupancy, self.occupancy_cfg,
                self.state.params, self.cfg, sub, mesh=self.mesh,
                thresh_cap=thresh_cap,
            )
        )
        # bumps the occupancy version (plan/frozen-program cache keys;
        # id() of the new dict can be GC-reused, so an explicit version is
        # the only safe key)
        self._occ_version = getattr(self, "_occ_version", 0) + 1

    def _cast_eval_tables(self, params):
        """Cast hash tables to opt.eval_table_dtype, cached per params
        version (the cache holds the source params, so identity comparison
        is safe against id reuse)."""
        if "encoder" not in params:
            return params  # frequency-encoded field: no tables to cast
        if (self._table_cast_cache is None
                or self._table_cast_cache[0] is not params):
            dtype = jnp.dtype(self.opt.eval_table_dtype)
            cast = dict(params)
            cast["encoder"] = [t.astype(dtype) for t in params["encoder"]]
            self._table_cast_cache = (params, cast)
        return self._table_cast_cache[1]

    def _tile_layout(self, H, W, chunk):
        """Cached tile-major frame layout: padded pixel coords (i, j) device
        arrays for direct tile-order ray generation, the inverse permutation
        (device, for the output un-permute gather), and the host perm.
        One entry per frame shape."""
        key = (H, W, chunk)
        tc = self._tile_layouts.get(key)
        if tc is None:
            from nerfnav_tpu.data.rays import tile_order

            perm, inv = tile_order(H, W, 64)
            jj, ii = np.meshgrid(np.arange(H, dtype=np.float32),
                                 np.arange(W, dtype=np.float32),
                                 indexing="ij")
            i = ii.reshape(-1)[perm]
            j = jj.reshape(-1)[perm]
            pad = (-H * W) % chunk
            if pad:
                # pad with the LAST real pixel (not (0,0)): pad outputs are
                # discarded by the inv-permute gather either way, but under
                # eval_beam a chunk-boundary beam can mix real and pad rays
                # — duplicating the last pixel keeps such a beam coherent
                i = np.concatenate([i, np.full(pad, i[-1], np.float32)])
                j = np.concatenate([j, np.full(pad, j[-1], np.float32)])
            tc = {"i": jnp.asarray(i), "j": jnp.asarray(j),
                  "inv": jnp.asarray(inv, jnp.int32), "perm": perm}
            self._tile_layouts[key] = tc
        return tc

    @staticmethod
    @jax.jit
    def _tile_ray_fn(pose, intrinsics, i, j, offset):
        from nerfnav_tpu.data.rays import rays_from_pixels

        r = rays_from_pixels(pose, intrinsics, i, j, offset=offset)
        return r["rays_o"], r["rays_d"]

    def invalidate_render_cache(self):
        """Drop every compiled eval/test/GUI render program and plan cache —
        call after changing march config, params layout, or table dtype
        underneath them (e.g. the GUI's dt_gamma slider)."""
        self._render_chunk_fns = {}
        self._render_scan_fns = {}
        self._ladder_plan = None
        self._table_cast_cache = None
        self._frozen_scan_cache = None
        self._beam_dilate_cache = None
        self._beam_guard_cache = {}

    def _auto_beam(self, intrinsics) -> int:
        """Per-frame AUTO beam width (TrainerOptions.eval_beam == 0): the
        largest power-of-two (<= 16, the tile-row divisor set) such that
        the in-beam pixel spread over the whole march span stays under one
        cascade-0 coarse cell — the MarchConfig.beam conservatism contract:
        spread ~ (b-1) * z_max / focal < cell edge 2*min(1,bound)/hc with
        z_max = 2*sqrt(3)*max(bound, 1) (higher cascades scale cell and
        span together). 800^2 f800 flagship -> 8; 128^2 wide-FOV -> 2."""
        mcfg = self.march_cfg
        if mcfg is None:
            return 1
        focal = float(np.minimum(intrinsics[0], intrinsics[1]))
        hc = mcfg.grid_size // mcfg.coarse_factor
        cell = 2.0 * min(1.0, mcfg.bound) / hc
        z_max = 2.0 * np.sqrt(3.0) * max(mcfg.bound, 1.0)
        b = int(focal * cell / z_max) + 1
        for cand in (16, 8, 4, 2):
            if b >= cand:
                return cand
        return 1

    def _beamed_occupancy(self, occupancy):
        """Occupancy dict with the 1-cell-dilated coarse table the beamed
        phase A needs, built ONCE per occupancy version (round-5 chip
        attribution: the in-march rebuild serialized ~0.4 ms of small-
        tensor work into every chunk, dominating the beamed phase A)."""
        if not (isinstance(occupancy, dict)
                and occupancy.get("blocks_coarse") is not None):
            return occupancy
        ver = getattr(self, "_occ_version", 0)
        cached = getattr(self, "_beam_dilate_cache", None)
        if cached is None or cached[0] != ver:
            from nerfnav_tpu.ops.marching import dilate_blocks_coarse
            from nerfnav_tpu.ops.morton import block_size_of

            bcrs = occupancy["blocks_coarse"]
            hc = self.march_cfg.grid_size // self.march_cfg.coarse_factor
            cached = (ver, dilate_blocks_coarse(bcrs, hc,
                                                block_size_of(bcrs)))
            self._beam_dilate_cache = cached
        return {**occupancy, "blocks_coarse_dilated": cached[1]}

    @staticmethod
    def _clamp_beam_to_rows(bm: int, W: int) -> int:
        """A beam must stay within ONE tile row: full rows are 64 px,
        right-edge tiles are W % 64 px — a beam straddling a row boundary
        spans ~W/64 px of in-beam spread (the beam-16 cliff failure mode,
        silently, and on by default via AUTO for e.g. W=820 -> 52-px edge
        rows). Step down to the next power of two dividing both (advisor
        round 4)."""
        edge = W % 64
        while bm > 1 and (64 % bm or (edge % bm if edge else 0)):
            bm //= 2
        return max(bm, 1)

    def _chunk_renderer(self, t_a0: int = 0, beam: int = 0):
        """Cached eval chunk renderer, keyed by the planned phase-A ladder
        length (0 = the config's auto ladder) and the beam width (0 = the
        march config's own)."""
        key = (t_a0, beam)
        if key not in self._render_chunk_fns:
            self._render_chunk_fns[key] = self._build_render_chunk(
                t_a0 or None, beam or None)
        return self._render_chunk_fns[key]

    def _render_scan_fn(self, t_a0: int = 0, beam: int = 0):
        """Whole-frame scan renderer (TrainerOptions.eval_scan): lax.map of
        the cached chunk core over stacked (C, chunk, 3) ray arrays — one
        dispatch per frame. jit re-specializes per chunk count, which is
        fixed for a given (H, W, max_ray_batch)."""
        fn = self._render_scan_fns.get((t_a0, beam))
        if fn is None:
            chunk_core = self._chunk_renderer(t_a0, beam)

            core = getattr(chunk_core, "_core", None)
            mcfg_pa = getattr(chunk_core, "_mcfg_rounds", None)
            use_pa = (self.opt.eval_frame_phase_a and core is not None
                      and mcfg_pa is not None and mcfg_pa.dt_gamma == 0.0)

            @partial(jax.jit, static_argnums=(4,))
            def render_scan(params, occupancy, ro_s, rd_s, bg_color: float,
                            crop_aabb=None):
                if use_pa:
                    # frame-level phase A (round 5): ONE frame-wide coarse
                    # march feeds every chunk precomputed segments — the
                    # per-chunk phase A is small-shape-bound at beamed
                    # widths (chip attribution, RESULTS.md round 5)
                    from nerfnav_tpu.ops.marching import march

                    C, CH, _ = ro_s.shape
                    mA = march(ro_s.reshape(-1, 3), rd_s.reshape(-1, 3),
                               occupancy, mcfg_pa, crop_aabb=crop_aabb,
                               stop_after="phase_a")
                    za = mA["z"].reshape(C, CH, -1)
                    dta = mA["dt"].reshape(C, CH, -1)
                    va = mA["valid"].reshape(C, CH, -1)

                    def body_pa(ab):
                        out = core(params, occupancy, ab[0], ab[1],
                                   bg_color, crop_aabb, None,
                                   phase_a={"z": ab[2], "dt": ab[3],
                                            "valid": ab[4]})
                        return out["image"], out["depth"]

                    return jax.lax.map(body_pa, (ro_s, rd_s, za, dta, va))

                def body(ab):
                    out = chunk_core(params, occupancy, ab[0], ab[1],
                                     bg_color, crop_aabb)
                    return out["image"], out["depth"]

                return jax.lax.map(body, (ro_s, rd_s))

            fn = self._render_scan_fns[(t_a0, beam)] = render_scan
        return fn

    def _render_scan_frozen(self, params, occupancy, t_a0: int = 0,
                            beam: int = 0):
        """Whole-frame scan renderer with params+occupancy BAKED as closure
        constants (see render_full(frozen=True)). Cached by (occupancy
        version, params identity, t_a0, beam); holds the latest entry only —
        frozen rendering uses one (ckpt, grid) pair at a time."""
        key = (getattr(self, "_occ_version", 0), id(params), t_a0, beam)
        cached = getattr(self, "_frozen_scan_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        from nerfnav_tpu.models import render_rays_grid_rounds

        cfg = self.cfg
        mcfg = self._apply_ladder_plan(self._eval_march_cfg(), t_a0)
        if beam and beam > 1:
            import dataclasses

            mcfg = dataclasses.replace(mcfg, beam=beam)
        shade_order = self.opt.shade_order
        field = make_field(params, cfg)
        # keep the baked arrays alive for the program's lifetime
        occ_ref = occupancy

        use_pa = self.opt.eval_frame_phase_a and mcfg.dt_gamma == 0.0

        @partial(jax.jit, static_argnums=(2,))
        def render_scan(ro_s, rd_s, bg_color: float, crop_aabb=None):
            if use_pa:
                # frame-level phase-A split (see _render_scan_fn)
                from nerfnav_tpu.ops.marching import march

                C, CH, _ = ro_s.shape
                mA = march(ro_s.reshape(-1, 3), rd_s.reshape(-1, 3),
                           occ_ref, mcfg, crop_aabb=crop_aabb,
                           stop_after="phase_a")
                za = mA["z"].reshape(C, CH, -1)
                dta = mA["dt"].reshape(C, CH, -1)
                va = mA["valid"].reshape(C, CH, -1)

                def body_pa(ab):
                    out = render_rays_grid_rounds(
                        field, occ_ref, mcfg, ab[0], ab[1],
                        bg_color=bg_color, crop_aabb=crop_aabb,
                        shade_order=shade_order,
                        phase_a={"z": ab[2], "dt": ab[3], "valid": ab[4]})
                    return out["image"], out["depth"]

                return jax.lax.map(body_pa, (ro_s, rd_s, za, dta, va))

            def body(ab):
                out = render_rays_grid_rounds(
                    field, occ_ref, mcfg, ab[0], ab[1], bg_color=bg_color,
                    crop_aabb=crop_aabb, shade_order=shade_order)
                return out["image"], out["depth"]

            return jax.lax.map(body, (ro_s, rd_s))

        self._frozen_scan_cache = (key, render_scan)
        return render_scan

    def _planned_ladder(self, occupancy) -> int:
        """Occupancy-derived static phase-A ladder length for eval rendering
        (TrainerOptions.eval_occ_ladder), planned once per occupancy version.

        Returns 0 (use the config's auto ladder) when planning is off, the
        march has an explicit override, the gamma=0 ladder is not normalized,
        or nothing is occupied yet. Otherwise an int t_a0_steps (dt_gamma=0)
        or a float gamma_span bound (dt_gamma > 0) — see _apply_ladder_plan.
        Plans are quantized UP (anchor runs / coarse-cell edges) so small
        occupancy drifts reuse the compiled render program."""
        mcfg = self.march_cfg
        if (mcfg is None or not self.opt.eval_occ_ladder
                or not self.opt.eval_rounds or not isinstance(occupancy, dict)):
            return 0
        gamma = mcfg.dt_gamma > 0.0
        if gamma:
            if mcfg.gamma_span:
                return 0
        elif not mcfg.coarse_normalized or mcfg.t_a0_steps:
            return 0
        ver = getattr(self, "_occ_version", 0)
        cached = self._ladder_plan
        if cached is not None and cached[0] == ver:
            return cached[1]
        from nerfnav_tpu.ops.marching import (
            phase_a_group_of, plan_gamma_span, plan_occupied_ladder,
        )

        bits = np.asarray(occupancy["bitfield"])
        occ = np.unpackbits(bits, axis=-1, bitorder="little")
        ecfg = self._eval_march_cfg()
        if gamma:
            span = plan_gamma_span(occ, ecfg)
            if span:
                # quantize up to FINE-cell edges so occupancy drifts within
                # a cell reuse the compiled program; a quantized span at or
                # over the full crossing is no shrink — plan 0 keeps the
                # auto ladder (and its compiled program)
                cell = 2.0 * min(2.0 ** (ecfg.cascades - 1),
                                 ecfg.bound) / ecfg.grid_size
                span = float(np.ceil(span / cell) * cell)
                full = 2.0 * np.sqrt(3.0) * max(ecfg.bound, 1.0)
                if span >= full:
                    span = 0.0
            plan = span
        else:
            t_a0 = plan_occupied_ladder(occ, ecfg)
            if t_a0:
                g = phase_a_group_of(ecfg)
                t_a0 = -(-t_a0 // g) * g
            plan = t_a0
        self._ladder_plan = (ver, plan)
        return plan

    def render_full(self, params, pose, intrinsics, H, W, bg_color=1.0,
                    crop_aabb=None, pixel_offset=None, frozen=False):
        """Staged full-image render with a cached jitted chunk fn
        (reference staged rendering, renderer.py:555-566).

        pixel_offset: optional (dx, dy) subpixel shift of every pixel center —
        the GUI's anti-aliasing spp passes (data/rays.get_all_rays).

        frozen=True: params/occupancy are BAKED into the compiled program as
        closure constants instead of traced arguments — chip A/B: the args
        program runs at 62% of the baked one (2.06M vs 3.29M rays/s; XLA
        exploits the tables as constants). Use for frozen rendering
        (test videos, post-training eval, paused-GUI viewing); each new
        (params, occupancy version) recompiles, so training-time eval and
        the training GUI keep the args program."""
        if self.opt.eval_table_dtype != "float32":
            params = self._cast_eval_tables(params)
        n = H * W
        chunk = self.rcfg.max_ray_batch
        pad = (-n) % chunk
        # spatially coherent 64x64-tile chunks let the rounds renderer's
        # all-dead early exit fire per chunk (background tiles skip all
        # shading); single-shot results are order-invariant, so the permute
        # is unconditionally safe
        use_tiles = self.march_cfg is not None and self.opt.eval_rounds
        rays = None
        if use_tiles:
            # rays generated DIRECTLY in padded tile-major order by one
            # jitted program (pixel coords cached per frame shape) — the
            # earlier generate-row-major-then-permute cost two 640k-row
            # device<->host round-trips per 800^2 frame
            tc = self._tile_layout(H, W, chunk)
            offset = jnp.asarray(
                pixel_offset if pixel_offset is not None else (0.0, 0.0),
                jnp.float32)
            ro, rd = self._tile_ray_fn(
                jnp.asarray(pose, jnp.float32),
                jnp.asarray(intrinsics, jnp.float32), tc["i"], tc["j"],
                offset)
            inv = tc["inv"]
        else:
            rays = get_all_rays(jnp.asarray(pose), jnp.asarray(intrinsics),
                                H, W, offset=pixel_offset)
            ro = jnp.pad(rays["rays_o"], ((0, pad), (0, 0)))
            rd = jnp.pad(rays["rays_d"], ((0, pad), (0, 0)), constant_values=1.0)
        occupancy = (
            self.state.occupancy
            if (self.march_cfg is not None and self.state is not None
                and self.state.occupancy is not None)
            else jnp.zeros((1, 1), jnp.uint8)
        )
        # occupancy-derived ladder shrink (bench-adopted +33%): one plan per
        # occupancy version selects the compiled render program
        occ_t_a0 = self._planned_ladder(occupancy)
        # beam-shared phase A rides ONLY on tile-ordered frames (the
        # pixel-adjacency contract); eval_beam 0 = AUTO from this frame's
        # focal, 1 = off, >1 = explicit
        bm = 0
        if use_tiles:
            bm = (self.opt.eval_beam if self.opt.eval_beam > 0
                  else self._auto_beam(intrinsics))
            bm = self._clamp_beam_to_rows(bm, W)
            bm = 0 if bm <= 1 else bm
        if bm > 1:
            # runtime contract guard (round-4 beam-16 cliff, advisor): one
            # spread measurement per (frame shape, beam, intrinsics class);
            # a violation means real segments would be SILENTLY dropped, so
            # refuse the beam loudly and render unbeamed
            import dataclasses as _dc

            gk = (H, W, bm, float(intrinsics[0]), float(intrinsics[1]))
            cache = getattr(self, "_beam_guard_cache", None)
            if cache is None:
                cache = self._beam_guard_cache = {}
            if gk not in cache:
                from nerfnav_tpu.ops.marching import beam_contract_violation

                mcfg_g = _dc.replace(self._eval_march_cfg(), beam=bm)
                cache[gk] = beam_contract_violation(np.asarray(rd[:4096]),
                                                    mcfg_g)
            if cache[gk] > 1.0:
                import logging

                logging.getLogger("nerfnav").warning(
                    "eval beam %d violates the 1-coarse-cell spread "
                    "contract (%.2f cells over the march span) on this "
                    "frame — rendering unbeamed; see MarchConfig.beam",
                    bm, cache[gk])
                bm = 0
        if bm > 1:
            occupancy = self._beamed_occupancy(occupancy)
        if self.opt.eval_scan:
            # the baked-constants program is built for the grid rounds path;
            # dense-path trainers keep the traced-args program
            if frozen and not (self.march_cfg is not None
                               and self.opt.eval_rounds):
                frozen = False
            if frozen:
                fn = self._render_scan_frozen(params, occupancy, occ_t_a0,
                                              bm)
                out_i, out_d = fn(ro.reshape(-1, chunk, 3),
                                  rd.reshape(-1, chunk, 3),
                                  float(bg_color), crop_aabb)
            else:
                out_i, out_d = self._render_scan_fn(occ_t_a0, bm)(
                    params, occupancy, ro.reshape(-1, chunk, 3),
                    rd.reshape(-1, chunk, 3), float(bg_color), crop_aabb
                )
            image = out_i.reshape(-1, 3)[:n]
            depth = out_d.reshape(-1)[:n]
            if use_tiles:
                image, depth = jnp.take(image, inv, 0), jnp.take(depth, inv, 0)
            return image.reshape(H, W, 3), depth.reshape(H, W)
        imgs, depths = [], []
        for i in range(0, n + pad, chunk):
            out = self._chunk_renderer(occ_t_a0, bm)(
                params, occupancy, ro[i : i + chunk], rd[i : i + chunk],
                float(bg_color), crop_aabb
            )
            imgs.append(out["image"])
            depths.append(out["depth"])
        image = jnp.concatenate(imgs)[:n]
        depth = jnp.concatenate(depths)[:n]
        if use_tiles:
            image, depth = jnp.take(image, inv, 0), jnp.take(depth, inv, 0)
        return image.reshape(H, W, 3), depth.reshape(H, W)

    def evaluate(self, ds, name: str | None = None, use_ema: bool = True,
                 frozen: bool = False):
        """Reference evaluate_one_epoch (utils.py:838-930): render the split,
        accumulate PSNR, dump validation images.

        frozen=True bakes params/occupancy into the render program (chip
        +60%; see render_full) — use for post-training eval of a loaded
        checkpoint, NOT for the training loop's periodic eval."""
        params = self.state.ema_params if (use_ema and self.state) else self.params
        if self.state is not None and not use_ema:
            params = self.state.params
        meter = PSNRMeter()
        out_dir = os.path.join(self.workspace, "validation")
        os.makedirs(out_dir, exist_ok=True)
        arrays = ds.as_arrays()
        for i in range(len(ds)):
            image, depth = self.render_full(
                params, ds.poses[i], ds.intrinsics, ds.H, ds.W, bg_color=1.0,
                frozen=frozen,
            )
            gt = np.asarray(arrays["images"][i], dtype=np.float32)
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
            meter.update(np.asarray(image), gt)
            self._save_image(
                os.path.join(out_dir, f"{self.opt.name}_ep{self.epoch:04d}_{i:04d}.png"),
                np.asarray(image),
            )
        result = meter.measure()
        self.stats["results"].append(result)
        if self.stats["best_result"] is None or result > self.stats["best_result"]:
            self.stats["best_result"] = result
            self.save_checkpoint(best=True)
        meter.write(self.writer, self.global_step, prefix="evaluate")
        self.log(f"eval epoch {self.epoch}: {meter.report()}")
        return result

    def test(self, ds, write_video: bool = True, name: str | None = None):
        """Reference test (utils.py:588-636): render a camera path, save pngs
        and an mp4 (frozen-baked programs; the frame-coherent sequence
        renderer was deleted round 5 after losing its make-or-kill — see
        benchmarks/RESULTS.md)."""
        params = self.state.ema_params if self.state else self.params
        out_dir = os.path.join(self.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        frames = []
        for i in range(len(ds)):
            image, depth = self.render_full(
                params, ds.poses[i], ds.intrinsics, ds.H, ds.W,
                bg_color=1.0, frozen=True
            )
            img8 = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
            frames.append(img8)
            self._save_image(
                os.path.join(out_dir, f"{name or self.opt.name}_{i:04d}.png"), img8
            )
            # depth dump (reference test_step saves depth too, utils.py:626-633)
            d = np.asarray(depth)
            d = d / max(float(d.max()), 1e-6)
            self._save_image(
                os.path.join(out_dir, f"{name or self.opt.name}_{i:04d}_depth.png"),
                d,
            )
        if write_video and frames:
            try:
                import imageio.v2 as imageio

                imageio.mimwrite(
                    os.path.join(out_dir, f"{name or self.opt.name}.mp4"),
                    np.stack(frames), fps=25, quality=8,
                )
            except Exception as e:  # codec availability varies
                # GIF needs only the Pillow backend — still a playable
                # artifact on hosts without an ffmpeg/pyav imageio plugin
                try:
                    import imageio.v2 as imageio

                    gif = os.path.join(out_dir, f"{name or self.opt.name}.gif")
                    imageio.mimwrite(gif, np.stack(frames), fps=25, loop=0)
                    self.log(f"mp4 write failed ({e}); wrote {gif} instead")
                except Exception:
                    self.log(f"mp4 write failed ({e}); pngs saved")
        return frames

    # ------------------------------------------------------------- GUI hooks
    def train_gui(self, train_ds, step: int = 16):
        """Run `step` training iterations and report timing — the hook the
        interactive viewer drives (reference utils.py:641-700 `train_gui`)."""
        arrays = train_ds.as_arrays()
        H, W = train_ds.H, train_ds.W
        C = arrays["images"].shape[-1]
        if self.state is None:
            self.state = self._init_state(len(train_ds))
        rng = np.random.default_rng(self.opt.seed + self.global_step)
        t0 = time.time()
        total = 0.0
        for _ in range(step):
            self._maybe_update_occupancy()
            idx = int(rng.integers(len(train_ds)))
            self.key, sub = jax.random.split(self.key)
            self.state, loss = self._step_fn(H, W, C)(
                self.state, arrays, jnp.asarray(idx), sub
            )
            self.global_step += 1
            total += float(loss)
        dt = time.time() - t0
        return {"loss": total / step, "time": dt,
                "steps_per_sec": step / max(dt, 1e-9)}

    def test_gui(self, pose, intrinsics, W, H, bg_color=1.0, spp=1,
                 downscale=1.0, crop_aabb=None, pixel_offset=None,
                 frozen=False):
        """Render one interactive frame at `downscale` resolution — the
        viewer's render hook (reference utils.py:703-752 `test_gui`).

        pixel_offset: optional (dx, dy) subpixel jitter for anti-aliasing
        accumulation passes (the viewer varies it per spp). frozen=True
        (viewer passes it while training is paused) bakes params/occupancy
        into the program — chip +60%."""
        rh, rw = max(int(H * downscale), 8), max(int(W * downscale), 8)
        intr = np.asarray(intrinsics, np.float32) * downscale
        params = self.state.ema_params if self.state else self.params
        t0 = time.time()
        if crop_aabb is not None:
            crop_aabb = jnp.asarray(crop_aabb, jnp.float32)
        image, depth = self.render_full(params, pose, intr, rh, rw, bg_color,
                                        crop_aabb=crop_aabb,
                                        pixel_offset=pixel_offset,
                                        frozen=frozen)
        dt = time.time() - t0
        img = np.asarray(image)
        if (rh, rw) != (H, W):
            import cv2

            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_LINEAR)
        return {"image": img, "time": dt}

    def save_mesh(self, path: str | None = None, resolution: int = 256,
                  threshold: float = 10.0):
        """Marching-tets mesh export of the density field
        (reference utils.py:533-553 `save_mesh`)."""
        from nerfnav_tpu.models import network as net
        from nerfnav_tpu.utils.mesh import extract_geometry, save_obj, save_ply

        params = self.state.ema_params if self.state else self.params
        cfg = self.cfg

        def density_fn(x):
            return net.density(params, x, cfg)["sigma"]

        verts, faces, _ = extract_geometry(
            density_fn, cfg.bound, resolution=resolution, threshold=threshold
        )
        path = path or os.path.join(
            self.workspace, "meshes", f"{self.opt.name}_{self.epoch}.ply"
        )
        (save_ply if path.endswith(".ply") else save_obj)(path, verts, faces)
        self.log(f"mesh saved to {path}: {len(verts)} verts, {len(faces)} faces")
        return path

    @staticmethod
    def _save_image(path, img):
        import imageio.v2 as imageio

        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(path, img)

    # --------------------------------------------------------- checkpointing
    def save_checkpoint(self, full: bool = False, best: bool = False):
        """Reference save_checkpoint (utils.py:938-998)."""
        meta = {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "stats": {k: v for k, v in self.stats.items()},
            # grid architecture — checked at load so a checkpoint trained
            # under a different -O / --grid_* resolution fails loudly instead
            # of silently keeping randomly-initialized template params
            "grid": self._grid_meta(),
        }
        if best:
            # model-only, occupancy grid stripped (utils.py:987-996)
            ckpt_lib.save_checkpoint(
                os.path.join(self.ckpt_dir, f"{self.opt.name}_best"),
                self.state.ema_params, meta,
            )
            return
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "ema_params": self.state.ema_params,
        }
        if full and self.state.error_maps is not None:
            tree["error_maps"] = self.state.error_maps
        if full and self.state.occupancy is not None:
            tree["occupancy"] = self.state.occupancy
        ckpt_lib.save_checkpoint(
            os.path.join(self.ckpt_dir, f"{self.opt.name}_ep{self.epoch:04d}"),
            tree, meta,
        )
        ckpt_lib.prune_checkpoints(self.ckpt_dir, self.opt.name, self.opt.max_keep_ckpt)

    def _grid_meta(self) -> dict:
        return ckpt_lib.grid_meta_of(self.cfg)

    def _check_grid_meta(self, meta: dict, path: str):
        ckpt_lib.check_grid_meta(meta, self.cfg, path)

    def _maybe_resume(self):
        """Reference load_checkpoint dispatch (utils.py:361-379, 1000-1060)."""
        mode = self.opt.use_checkpoint
        if mode == "scratch":
            return
        path = None
        if mode == "latest":
            path = ckpt_lib.latest_checkpoint(self.ckpt_dir, self.opt.name)
        elif mode == "best":
            p = os.path.join(self.ckpt_dir, f"{self.opt.name}_best.npz")
            path = p if os.path.exists(p) else None
        elif mode not in ("latest", "best"):
            path = mode if os.path.exists(mode) else None
        if path is None:
            self.log("no checkpoint found, training from scratch")
            return
        if "best" in os.path.basename(path):
            params, meta, report = ckpt_lib.load_checkpoint(path, self.state.params)
            self._check_grid_meta(meta, path)
            self.state = self.state._replace(params=params, ema_params=params)
        else:
            tmpl = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "ema_params": self.state.ema_params,
            }
            if self.state.error_maps is not None:
                tmpl["error_maps"] = self.state.error_maps
            if self.state.occupancy is not None:
                tmpl["occupancy"] = self.state.occupancy
            tree, meta, report = ckpt_lib.load_checkpoint(path, tmpl)
            self._check_grid_meta(meta, path)
            self.state = self.state._replace(
                params=tree["params"],
                opt_state=tree["opt_state"],
                ema_params=tree["ema_params"],
                error_maps=tree.get("error_maps", self.state.error_maps),
                occupancy=tree.get("occupancy", self.state.occupancy),
            )
            self._occ_version = getattr(self, "_occ_version", 0) + 1
        self.epoch = meta.get("epoch", 0)
        self.global_step = meta.get("global_step", 0)
        self.stats.update(meta.get("stats", {}))
        for r in report:
            self.log("ckpt:", r)
        self.log(f"resumed from {path} (epoch {self.epoch})")
