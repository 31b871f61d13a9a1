"""Occupancy-grid state: multi-cascade density grid + packed bitfield.

Capability parity: reference nerf/renderer.py —
  * grid shape: 128^3 per cascade, cascades = 1 + ceil(log2(bound))
    (renderer.py:73-74, 89-101)
  * `update_extra_state` (446-539): full sweep for the first 16 updates, then
    partial updates of (random uniform + random occupied) cells; density EMA
    `grid = max(grid * 0.95, fresh)`; occupancy threshold
    `min(mean_density, density_thresh)`; repack bitfield
  * `mark_untrained_grid` (381-444): cells outside every training camera
    frustum are pinned to -1 so they never activate
  * `reset_extra_state` (113-118)

TPU-native design: the state is a pytree of dense arrays; every update is one
jitted program (density sweep is lax.map-chunked so the MLP sees fixed-size
batches); partial-update cell choice uses categorical sampling over the
occupancy mask instead of the reference's host-side index juggling; the
bitfield layout is row-major (see ops/morton.py docstring).
"""

from dataclasses import dataclass
from functools import cached_property, partial
import math

import jax
import jax.numpy as jnp

from nerfnav_tpu.models import network as net
from nerfnav_tpu.ops.morton import pack_blocks, packbits


@dataclass(frozen=True)
class OccupancyConfig:
    bound: float = 1.0
    grid_size: int = 128                 # H (renderer.py:73)
    density_thresh: float = 10.0         # main_nerf.py:48
    decay: float = 0.95                  # renderer.py:496
    n_full_updates: int = 16             # renderer.py:451
    update_chunk: int = 2 ** 17          # density-query batch inside the sweep
    min_near: float = 0.2
    coarse_factor: int = 4               # coarse bitfield maxpool (marcher phase A)
    # EMA-decay scope for partial updates. The REFERENCE decays only cells the
    # sweep actually sampled (valid_mask = (grid >= 0) & (tmp >= 0),
    # renderer.py:500-505); decaying every trained cell ("all") additionally
    # bleeds 5%/sweep out of cells the draw missed. Chip A/B on the 30k
    # reference-lr drift probe (RESULTS.md round 4): reference semantics
    # ("sampled") collapses EARLIER and 2 dB DEEPER (26.0 peak -> 21.5) than
    # "all" (28.4 -> 23.5) — under our STATIC per-ray sample budget a
    # slower-carved (denser) grid dilutes sampling resolution, a coupling the
    # reference's adaptive-length marcher doesn't have. Default keeps the
    # measured-better decay-all behavior.
    ema_sampled_only: bool = False
    # Occupancy hysteresis (round-4 drift candidate): a cell TURNS ON at
    # density > thresh but only turns OFF below occ_hysteresis * thresh.
    # Rationale: cells at the carve boundary flicker in/out every
    # maintenance sweep (jittered density queries straddle the bar), and
    # under the STATIC per-ray sample budget each flip reshuffles the
    # thinned sample lattice — a noise source the late lr chases
    # (occ_freeze@6k holds >= 28 dB where control collapses; per-ray
    # stride-phase hashing did NOT fix it, so the churn is the remaining
    # lattice-noise suspect). Conservative-correct: keeping a marginal cell
    # marched only spends samples. 0 = off (reference semantics:
    # renderer.py:508 single threshold both directions).
    occ_hysteresis: float = 0.0
    # Round-5 growth-clamp candidates. Round-4 drift diagnosis: across the
    # 30k collapse the grid ACCRETES junk — occ_frac rises 0.204 -> 0.214
    # and mean_density grows 18x while churn stays ~2% — because the
    # max-EMA keeps the MAX of late jittered queries (one high outlier
    # pins a cell for ~log(thresh/val)/log(decay) ~ 50 sweeps).
    # density_write_clamp: fresh sweep densities are clamped at
    #   density_write_clamp * density_thresh before entering the EMA
    #   (0 = off). The compositor saturates (alpha -> 1 for sigma*dt >> 1)
    #   long before such values, so the clamp is render-neutral for
    #   occupancy decisions (clamp_value > thresh keeps occ bits
    #   identical); it bounds mean_density and shortens the EMA carve time
    #   of cells whose queries drop.
    density_write_clamp: float = 0.0
    # ema_toward_query: replace max-EMA with a symmetric mean-EMA toward
    #   the fresh query for sampled cells (new = decay*grid +
    #   (1-decay)*tmp). Debounces activation: a single high jittered
    #   outlier no longer pins a cell; persistent real density (queried
    #   high every sweep) still activates within 1-2 full sweeps.
    #   Trade-off: thin features whose jittered queries mostly miss may
    #   under-mark — the A/B decides.
    ema_toward_query: bool = False
    # Debounced ACTIVATION (round-5, the synthesis of six failed arms): a
    # cell may only turn ON after its sweep query exceeds the carve bar in
    # TWO CONSECUTIVE observed sweeps; carving and the max-EMA memory are
    # untouched. Rationale from the drift ledger: occ_frac GROWS through
    # the 30k collapse while sticky-off hysteresis does nothing -> junk
    # ACTIVATION (one high jittered query pins a cell via max-EMA) is the
    # live culprit; the clamp arm (faster carving) and mean-EMA arm (lost
    # thin-feature memory) both made epoch-1 quality WORSE, so the filter
    # must act at activation only. A jitter outlier with hit probability p
    # activates at p^2; genuinely dense cells pass in 2 sweeps (~32 train
    # steps of lag). Adds a "pending" state plane when enabled.
    occ_debounce: bool = False

    @cached_property
    def cascades(self) -> int:
        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))

    @cached_property
    def n_cells(self) -> int:
        return self.grid_size ** 3


def _blocks_supported(cfg: OccupancyConfig) -> bool:
    hc = cfg.grid_size // cfg.coarse_factor
    return cfg.grid_size % 4 == 0 and hc % 4 == 0


def init_occupancy_state(cfg: OccupancyConfig):
    hc = cfg.grid_size // cfg.coarse_factor
    state = {
        "density_grid": jnp.zeros((cfg.cascades, cfg.n_cells), jnp.float32),
        "bitfield": jnp.zeros((cfg.cascades, cfg.n_cells // 8), jnp.uint8),
        # maxpooled coarse mirror for the two-phase marcher
        "bitfield_coarse": jnp.zeros((cfg.cascades, hc**3 // 8), jnp.uint8),
        "mean_density": jnp.asarray(0.0, jnp.float32),
        "iter_density": jnp.asarray(0, jnp.int32),
        # min-pooled coarse density (filled by _finish_update); present from
        # init so the state pytree structure never changes — update and
        # checkpoint-resume templates must match (no retrace, no silent drop)
        "density_coarse_min": jnp.zeros((cfg.cascades, hc**3), jnp.float32),
    }
    if cfg.occ_debounce:
        # activation-debounce plane: cells observed above the bar LAST
        # sweep but not yet active (see OccupancyConfig.occ_debounce)
        state["pending"] = jnp.zeros((cfg.cascades, cfg.n_cells), bool)
    if _blocks_supported(cfg):
        # block rows for the gather-lean marcher (ops/marching.py); the
        # coarse mirror uses the widest block the grid admits (512-bit rows
        # double the anchor-run span at identical test resolution)
        bc = 8 if hc % 8 == 0 else 4
        state["blocks"] = jnp.zeros(
            (cfg.cascades, (cfg.grid_size // 4) ** 3, 2), jnp.uint32
        )
        state["blocks_coarse"] = jnp.zeros(
            (cfg.cascades, (hc // bc) ** 3, bc**3 // 32), jnp.uint32
        )
    return state


def _cell_centers(cfg: OccupancyConfig, cell_idx):
    """Flat row-major cell indices -> centers in [-1, 1]^3 (unit cube; scaled
    per cascade by the caller)."""
    H = cfg.grid_size
    x = cell_idx // (H * H)
    y = (cell_idx // H) % H
    z = cell_idx % H
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
    return (coords + 0.5) / H * 2.0 - 1.0


def _query_cells(params, net_cfg, cfg: OccupancyConfig, cell_idx, cas, key,
                 mesh=None):
    """Density at a perturbed point inside each cell of cascade `cas`
    (reference renderer.py:455-476). With a device mesh the per-chunk point
    batch is sharded over the "data" axis, so the density sweep runs SPMD
    across chips (the reference's update is single-GPU; our eval/occupancy
    sharding replaces its NCCL eval all_gather, utils.py:866-882)."""
    H = cfg.grid_size
    centers = _cell_centers(cfg, cell_idx)  # in [-1,1]
    cas_bound = jnp.minimum(2.0 ** cas, cfg.bound)
    half_cell = cas_bound / H
    pts = centers * (cas_bound - half_cell)
    jitter = (jax.random.uniform(key, pts.shape) * 2.0 - 1.0) * half_cell
    pts = pts + jitter

    def chunk_density(p):
        if mesh is not None:
            from nerfnav_tpu.parallel.sharding import shard_rays

            p = shard_rays(p, mesh)
        return net.density(params, p, net_cfg)["sigma"]

    n = pts.shape[0]
    c = min(cfg.update_chunk, n)
    pad = (-n) % c
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    sig = jax.lax.map(chunk_density, pts_p.reshape(-1, c, 3))
    return sig.reshape(-1)[:n]


@partial(jax.jit, static_argnums=(1, 3, 5))
def _update_full(state, cfg: OccupancyConfig, params, net_cfg, key, mesh=None,
                 thresh_cap=None):
    grid = state["density_grid"]
    tmp = jnp.full_like(grid, -1.0)
    all_cells = jnp.arange(cfg.n_cells)
    for cas in range(cfg.cascades):
        key, sub = jax.random.split(key)
        sig = _query_cells(params, net_cfg, cfg, all_cells, cas, sub, mesh)
        tmp = tmp.at[cas].set(sig * net_cfg.density_scale)
    return _finish_update(state, cfg, grid, tmp, all_cells_mask=None,
                          thresh_cap=thresh_cap)


@partial(jax.jit, static_argnums=(1, 3, 5))
def _update_partial(state, cfg: OccupancyConfig, params, net_cfg, key,
                    mesh=None, thresh_cap=None):
    grid = state["density_grid"]
    # N/4 uniform cells PLUS N/4 occupied-biased cells per cascade —
    # reference renderer.py:478-494 draws H^3/4 of each, not half of each.
    n_sample = cfg.n_cells // 4
    tmp = jnp.full_like(grid, -1.0)
    for cas in range(cfg.cascades):
        key, k1, k2, k3 = jax.random.split(key, 4)
        # Occupied sampling via inverse-CDF searchsorted over the occupancy
        # mask cumsum — O(n log n); jax.random.categorical over 2M categories
        # would materialize a (draws x cells) Gumbel tensor (13s/update).
        rand_cells = jax.random.randint(k1, (n_sample,), 0, cfg.n_cells)
        occ_mask = (grid[cas] > 0).astype(jnp.float32)
        cdf = jnp.cumsum(occ_mask)
        total = cdf[-1]
        u = jax.random.uniform(k2, (n_sample,)) * jnp.maximum(total, 1.0)
        occ_cells = jnp.clip(
            jnp.searchsorted(cdf, u, side="right"), 0, cfg.n_cells - 1
        )
        # no occupied cells yet -> fall back to uniform
        occ_cells = jnp.where(total > 0, occ_cells, rand_cells)
        cells = jnp.concatenate([rand_cells, occ_cells])
        sig = _query_cells(params, net_cfg, cfg, cells, cas, k3, mesh)
        tmp = tmp.at[cas, cells].max(sig * net_cfg.density_scale)
    return _finish_update(state, cfg, grid, tmp, all_cells_mask=None,
                          thresh_cap=thresh_cap)


def _finish_update(state, cfg, grid, tmp, all_cells_mask, thresh_cap=None):
    # EMA-max. Decay scope is cfg.ema_sampled_only (see OccupancyConfig):
    # "sampled" is the reference's valid_mask (renderer.py:500-505) but
    # chip-measured 2 dB WORSE on the 30k drift probe under our static
    # sample budget; the default decays every trained cell. Untrained cells
    # (-1 in grid) stay negative either way.
    if cfg.ema_sampled_only:
        valid = (grid >= 0) & (tmp >= 0)
    else:
        valid = grid >= 0
    tmp_stored = tmp
    if cfg.density_write_clamp > 0.0:
        # bound STORED writes at clamp*thresh (see OccupancyConfig): junk
        # spikes lose their ~50-sweep EMA-decay immunity. The mean_density
        # statistic stays on the RAW (unclamped) EMA below — the carve bar
        # min(mean, density_thresh) must track the reference's dynamics, or
        # the clamp silently LOWERS the bar and floods occupancy with junk
        # cells (chip-measured -4 to -6 dB from epoch 1 when the mean was
        # computed post-clamp).
        tmp_stored = jnp.minimum(
            tmp, cfg.density_write_clamp * cfg.density_thresh)
    if cfg.ema_toward_query:
        sampled = tmp >= 0
        cand = cfg.decay * grid + (1.0 - cfg.decay) * tmp_stored
        new_grid = jnp.where(
            valid & sampled, cand,
            jnp.where(valid, grid * cfg.decay, grid),
        )
    else:
        new_grid = jnp.where(
            valid, jnp.maximum(grid * cfg.decay, tmp_stored), grid)
    if cfg.density_write_clamp > 0.0:
        # bar statistic from the raw sweep values (one extra elementwise max
        # over the grid, fused by XLA; nothing raw is stored)
        new_raw = jnp.where(valid, jnp.maximum(grid * cfg.decay, tmp), grid)
        mean_density = jnp.mean(jnp.clip(new_raw, 0.0, None))
    else:
        mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    if thresh_cap is not None:
        # pinned carve bar (TrainerOptions.occ_thresh_freeze_after): stops
        # the min(mean, density_thresh) ratchet while density updates and
        # EMA-decay carving continue. Round-4 chip verdict: on the drift
        # probe the arm is bitwise identical to control (the bar was already
        # pinned at density_thresh), so the ratchet is NOT the late-schedule
        # collapse driver. Diagnostic knob only.
        thresh = jnp.minimum(thresh, thresh_cap)
    occ = new_grid > thresh
    new_pending = None
    if cfg.occ_debounce:
        # two-consecutive-observations activation filter (see
        # OccupancyConfig.occ_debounce): an INACTIVE cell needs tmp > bar
        # in this sweep AND the previous observed sweep; active cells and
        # carving follow the reference rule unchanged
        from nerfnav_tpu.ops.morton import unpackbits

        prev_occ = unpackbits(state["bitfield"]).reshape(occ.shape) > 0
        sampled = tmp >= 0
        tmp_high = sampled & (tmp > thresh)
        pending = state["pending"]
        occ = occ & (prev_occ | (tmp_high & pending))
        # pending persists for unsampled cells until the next observation
        new_pending = jnp.where(sampled, tmp_high & ~occ, pending & ~occ)
    if cfg.occ_hysteresis > 0.0:
        # sticky carve bar (OccupancyConfig.occ_hysteresis): a cell already
        # in the bitfield stays occupied down to hysteresis * thresh —
        # boundary-cell flicker is what reshuffles the static-budget sample
        # lattice between sweeps
        from nerfnav_tpu.ops.morton import unpackbits

        prev_occ = unpackbits(state["bitfield"]).reshape(occ.shape) > 0
        occ = occ | (prev_occ & (new_grid > cfg.occ_hysteresis * thresh))
    bitfield = packbits(occ.astype(jnp.float32))
    # coarse maxpool mirror (row-major (x*H + y)*H + z layout)
    h, f = cfg.grid_size, cfg.coarse_factor
    hc = h // f
    occ3 = occ.reshape(cfg.cascades, hc, f, hc, f, hc, f)
    occ_coarse = occ3.max(axis=(2, 4, 6)).reshape(cfg.cascades, hc**3)
    out = {
        "density_grid": new_grid,
        "bitfield": bitfield,
        "bitfield_coarse": packbits(occ_coarse.astype(jnp.float32)),
        "mean_density": mean_density,
        "iter_density": state["iter_density"] + 1,
    }
    if new_pending is not None:
        out["pending"] = new_pending
    if _blocks_supported(cfg):
        out["blocks"] = pack_blocks(occ, cfg.grid_size)
        out["blocks_coarse"] = pack_blocks(
            occ_coarse, hc, block=8 if hc % 8 == 0 else 4
        )
    # min-pooled coarse density for segment-level occlusion termination
    # (ops/marching.py march_rays_block): the min over an f^3 tile
    # underestimates the density along ANY path through it, so the proxy
    # transmittance OVERestimates and termination is conservative (late).
    # Values are SCALED density (sigma * density_scale), like density_grid.
    # Untrained (-1) cells clamp to 0 and never terminate.
    dens3 = jnp.clip(new_grid, 0.0, None).reshape(
        cfg.cascades, hc, f, hc, f, hc, f
    )
    out["density_coarse_min"] = dens3.min(axis=(2, 4, 6)).reshape(
        cfg.cascades, hc**3
    )
    return out


def update_extra_state(state, cfg: OccupancyConfig, params, net_cfg, key,
                       mesh=None, thresh_cap=None):
    """Dispatch full/partial exactly like renderer.py:446-451. Host-level
    branch on the update counter (a host scalar between jitted steps).
    mesh: optional device mesh — shards the density sweep SPMD.
    thresh_cap: optional traced scalar pinning the carve threshold (see
    _finish_update)."""
    if int(state["iter_density"]) < cfg.n_full_updates:
        return _update_full(state, cfg, params, net_cfg, key, mesh,
                            thresh_cap=thresh_cap)
    return _update_partial(state, cfg, params, net_cfg, key, mesh,
                           thresh_cap=thresh_cap)


def reset_extra_state(state, cfg: OccupancyConfig):
    """reference renderer.py:113-118."""
    return init_occupancy_state(cfg)


@partial(jax.jit, static_argnums=(1,), static_argnames=("img_hw",))
def _mark_untrained(state, cfg: OccupancyConfig, poses, intrinsics, img_hw):
    H_img, W_img = img_hw
    grid = state["density_grid"]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    all_cells = jnp.arange(cfg.n_cells)

    R = poses[:, :3, :3]  # (P, 3, 3) c2w
    t = poses[:, :3, 3]   # (P, 3)

    def visible_count(pts):
        # world -> camera: x_cam = R^T (x - t); +z forward convention
        rel = pts[:, None, :] - t[None]                       # (n, P, 3)
        cam = jnp.einsum("npj,pji->npi", rel, R)              # R^T applied
        x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
        in_front = z > cfg.min_near
        # frustum test with half-pixel slack (reference renderer.py:411-423)
        in_x = jnp.abs(x) * fx < (W_img / 2 + 0.5) * jnp.abs(z)
        in_y = jnp.abs(y) * fy < (H_img / 2 + 0.5) * jnp.abs(z)
        return jnp.sum(in_front & in_x & in_y, axis=-1)

    new_grid = grid
    for cas in range(cfg.cascades):
        cas_bound = min(2.0 ** cas, cfg.bound)
        centers = _cell_centers(cfg, all_cells) * (cas_bound - cas_bound / cfg.grid_size)

        def chunk_fn(p):
            return visible_count(p)

        c = cfg.update_chunk
        n = centers.shape[0]
        pad = (-n) % c
        cp = jnp.pad(centers, ((0, pad), (0, 0)))
        counts = jax.lax.map(chunk_fn, cp.reshape(-1, c, 3)).reshape(-1)[:n]
        new_grid = new_grid.at[cas].set(
            jnp.where(counts == 0, -1.0, new_grid[cas])
        )
    return {**state, "density_grid": new_grid}


def mark_untrained_grid(state, cfg: OccupancyConfig, poses, intrinsics, H_img, W_img):
    """reference renderer.py:381-444."""
    return _mark_untrained(state, cfg, poses, intrinsics, (int(H_img), int(W_img)))
