"""Occupancy-grid ray marching under static shapes.

Capability parity: reference raymarching/src/raymarching.cu —
`march_rays_train` (314-495: per-ray marching with empty-space skipping via
the density bitfield, adaptive step `dt = clamp(t*dt_gamma, dt_min, dt_max)`,
mip level `max(mip_from_pos, mip_from_dt)`, perturbed start, global point
budget with ray-drop) and the inference marcher `march_rays` (707-825).

TPU-native design (SURVEY.md 7, hard part #1): the CUDA version's dynamic
output (per-ray variable step counts + atomic slab allocation) is replaced by
a fully data-parallel two-phase formulation with static shapes:

  Phase A — candidate lattice: a trace-time step ladder tau_i (dt follows the
  reference's clamp formula) spans [near, far] for every ray at once; all
  N x T candidate positions are tested against the packed bitfield in ONE
  vectorized gather — no sequential skip loop; "skipping" falls out as a
  mask, and the per-candidate cost is a byte gather + bit test on the VPU.

  Phase B — static compaction: each ray keeps its first K occupied
  candidates via cumsum-slot scatter (slot >= K drops, reproducing the
  reference's point-budget ray-drop, raymarching.py:198-203). The MLP then
  runs on a dense (N*K, 3) batch — exactly the fixed-size, MXU-friendly
  layout XLA wants.

Everything is jit/grad-compatible; gradients flow through densities/colors
and through ray origins (near/far), not through the discrete sample choice —
matching the reference where marching runs under no-grad.
"""

from dataclasses import dataclass
from functools import cached_property
import math

import numpy as np
import jax
import jax.numpy as jnp

_SQRT3 = math.sqrt(3.0)


@dataclass(frozen=True)
class MarchConfig:
    bound: float = 1.0
    grid_size: int = 128          # H, must match OccupancyConfig
    max_steps: int = 1024         # candidate lattice length (main_nerf.py:28)
    samples_per_ray: int = 64     # K: static per-ray sample budget
    dt_gamma: float = 0.0         # adaptive stepping (main_nerf.py:47)
    min_near: float = 0.2
    coarse_factor: int = 4        # spatial maxpool of the phase-A bitfield
    coarse_step_mult: int = 8     # phase-A step = coarse_step_mult * dt_min
    coarse_segments: int = 16     # K_A: occupied coarse segments kept per ray
    coarse_normalized: bool = True  # per-ray phase-A ladder over [near, far]
    coarse_anchors: int = 3       # phase-A anchor gathers per run (block
    #   marcher): 2 = run endpoints only (fewer gather rows; mid-run block
    #   transitions fall back to conservative-occupied and phase B's exact
    #   fine test rejects them), 3 = ends + middle (round-1 default),
    #   1 = run START only (maximum conservative fallback: every candidate
    #   past the run's first block crossing tests occupied; phase B's exact
    #   fine test still rejects — correctness preserved, phase-B volume
    #   grows; round-3 chip probe)
    proxy_terminate: bool = False  # occlusion-terminate samples via the
    #   stored EMA density grid (inference only; see proxy_terminate_valid)
    # transmittance floor. The reference retires at 1e-4 on TRUE composited
    # transmittance (raymarching.cu:871); the proxy uses the EMA grid's
    # per-cell MAXIMA, which overestimate opacity where a ray crosses the
    # empty part of a surface cell — 100x more conservative costs only ~2-3
    # extra samples at an opaque surface and avoids silhouette clipping.
    proxy_thresh: float = 1e-6
    first_k: bool = False  # final compaction policy: keep the first
    #   first_k_frac*K occupied candidates at FULL dt resolution and stride-
    #   spread the remaining budget over the rest of the occupied span.
    #   The front section is the reference's own inference semantics (march
    #   consecutively from near, retire on occlusion,
    #   raymarching.cu:707-825): once the grid is carved, the first samples
    #   ARE the visible surface, and thinning them is what cost K-shrink
    #   0.86 dB in round 1. The spread tail bounds the worst case: a grazing
    #   ray whose surface entry lies beyond the front section's reach (its
    #   chord through the occupancy margin can be many cells long) still
    #   covers the whole occupied range, just coarser — the analogue of the
    #   reference's dt_max clamp. Inference-only: training keeps the full
    #   budget-stride spread (truncation starves far geometry of gradient
    #   while the early grid is still dense — the round-1 9.6 dB failure).
    first_k_frac: float = 0.75    # fraction of K at full resolution
    coarse_first_k: bool = False  # phase-A compaction policy (block marcher):
    #   keep the first first_k_frac*K_A occupied coarse segments at FULL
    #   resolution and stride-spread the rest, instead of thinning the whole
    #   span. MEASURED HARMFUL on partially-carved grids (RESULTS.md pass 4:
    #   17.5 dB vs 25.3 at seg8 — the front budget is spent inside the
    #   occupancy margin BEFORE the surface, and the tail stride over the
    #   few remaining slots is far coarser than uniform thinning). Only a
    #   candidate for fully-converged thin-shell occupancies; keep False.
    t_a0_steps: int = 0           # STATIC phase-A ladder length override
    #   (normalized ladders only; 0 = auto ceil(2*sqrt(3)*bound / cap)).
    #   Short-ladder callers (the occ-ladder plan; historically the
    #   round-4 sequence renderer's window buckets, deleted round 5)
    #   dispatch rays whose spans fit the shrunk ladder. CALLER CONTRACT: every ray's [near, far]
    #   span (after the z_window narrowing) must satisfy
    #   ceil(span / phase_a_cap) <= t_a0_steps, or the ladder's cap-clamped
    #   tail silently cuts far geometry.
    phase_a_group: int = 0        # phase-A anchor-run length override for
    #   the block marcher (0 = auto from the coarse block span). The chip
    #   sweep over static ladder lengths (RESULTS.md round-2 "ladder-shape
    #   cliff") found run COUNT t_a/g_a is the perf driver: 8 runs beat the
    #   auto 9-10 by ~22% and 5-7 runs are 2x SLOWER. Smaller groups also
    #   tighten the anchor-match geometry (a run spans fewer block
    #   crossings), so correctness is unaffected (conservative-occupied
    #   only shrinks).
    stride_phase: str = "random"  # overflow-stride phase source when a key
    #   is supplied: "random" = stratified per step (reference-style
    #   perturb); "ray_hash" = deterministic per ray (hash of the ray
    #   direction bits -> uniform in [0,1)). Rationale (round-3 drift fix):
    #   when a ray's occupied count exceeds K, the thinned sample lattice
    #   shifts by stride*dt with the phase — per-STEP random phases make
    #   every pixel's render a noisy estimator, and late in a 30k-step run
    #   (lr ~1e-3, dt-anneal floor) the optimizer chases that noise
    #   (28.48 -> 23.55 dB collapse under the reference lr schedule,
    #   RESULTS.md queue 7). A per-ray hash phase keeps each ray's lattice
    #   FIXED across steps (zero per-step variance) while staying
    #   decorrelated across rays (no global lattice<->field coupling — the
    #   round-1 failure was ONE phase shared by all rays). Rays with
    #   count <= K are exact marches either way.
    gamma_span: float = 0.0       # STATIC gamma-ladder span override in world
    #   units (dt_gamma > 0 only; 0 = full worst-case crossing
    #   2*sqrt(3)*bound). The gamma analogue of t_a0_steps: plan_gamma_span
    #   bounds the span any ray's occupied content can cover by the
    #   occupied-AABB corner distances, and the static gamma ladders
    #   (MarchConfig.ladder / coarse_gamma_ladder) stop once tau exceeds it —
    #   candidates dropped are beyond every occupied cell by construction,
    #   so the sample set is unchanged. A span change recompiles the march.
    beam: int = 1                 # phase-A beam sharing (block marcher,
    #   inference): consecutive `beam` rays share ONE phase-A march — the
    #   beam ray (first member's origin, mean direction, min/max near/far)
    #   walks the coarse ladder against a 1-CELL-DILATED coarse table, and
    #   the kept segments broadcast to every member; phase B stays per-ray
    #   exact against the UNdilated fine grid. Chip attribution (round 5,
    #   exact stop_after split): phase A is 75.2 of the 198.5 ms rounds
    #   frame at beam 1, and adjacent pixels traverse near-identical coarse
    #   cells — beam=b cuts that cost ~b x PROVIDED the dilated table is
    #   PRECOMPUTED (occupancy["blocks_coarse_dilated"], once per occupancy
    #   version): the in-graph rebuild costs ~0.33 ms of serialized small
    #   ops per marched chunk, which at 157 chunks/frame handed back nearly
    #   the whole beam win in round 4.
    #   CONSERVATIVE by construction when every member ray stays within one
    #   coarse cell of the beam ray over the whole march span: spread ~
    #   (b-1)*z_max/focal must stay under the cascade-0 cell edge
    #   2*min(1,bound)/hc (Trainer._auto_beam computes the largest safe
    #   power of two — 8 at 800^2/f800; 16 would need a 2-cell dilation).
    #   The dilation then guarantees the beam test is a superset of each
    #   member's own: false positives only (phase B rejects), never a
    #   dropped segment. Members are CONSECUTIVE
    #   rays: pixel-coherent chunk layouts (row-major tiles) satisfy the
    #   spread bound; callers with scrambled ray order must keep beam=1.
    #   N must divide by beam (else silently off). Inference-only by
    #   design: the training sampler's per-ray batches are not coherent.
    a0_segments: int = 0          # super-coarse phase-A0 prefilter (block
    #   marcher, normalized ladders only): walk a ~15-candidate ladder at one
    #   COARSE-BLOCK-edge step against the "any cell in block occupied" bit
    #   (one bool per 512-bit blocks_coarse row — a (cascades*nb^3,)-entry
    #   VMEM table), keep the first a0_segments occupied block spans, and run
    #   phase A's cell-exact ladder only inside them. Cuts phase-A candidate
    #   volume ~2.4x (114 -> ~a0_segments*(mult0+1)) on carved scenes.
    #   0 disables (phase A walks the full [near, far] ladder).

    @cached_property
    def cascades(self) -> int:
        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))

    @cached_property
    def dt_min(self) -> float:
        # reference raymarching.cu:347: 2*sqrt(3)/max_steps
        return 2.0 * _SQRT3 / self.max_steps

    @cached_property
    def dt_max(self) -> float:
        # reference raymarching.cu:348: 2*sqrt(3)*2^(C-1)/H
        return 2.0 * _SQRT3 * (2 ** (self.cascades - 1)) / self.grid_size

    @cached_property
    def ladder(self):
        """(tau, dt) numpy arrays of length T <= max_steps: the trace-time
        step ladder. tau_0 = 0; dt_i = clamp(tau_i * gamma, dt_min, dt_max)."""
        taus, dts = [], []
        t = 0.0
        span = 2.0 * _SQRT3 * max(self.bound, 1.0)
        if self.gamma_span > 0.0:
            span = min(span, self.gamma_span)
        for _ in range(self.max_steps):
            dt = float(np.clip(t * self.dt_gamma, self.dt_min, self.dt_max))
            taus.append(t)
            dts.append(dt)
            t += dt
            if t > span:
                break
        return np.asarray(taus, np.float32), np.asarray(dts, np.float32)

    @cached_property
    def coarse_gamma_ladder(self):
        """Trace-time PHASE-A ladder for dt_gamma > 0 (adaptive stepping,
        reference raymarching.cu:347-369 in the two-phase formulation):
        coarse segment i starts at tau_i with length
        dtc_i = min(mult * clamp(tau_i*gamma, dt_min, dt_max), cap), where
        `cap` is just under one coarse cell edge at the TOP cascade — the
        occupancy lookup's mip_from_dt guarantees the test cell is at least
        dtc wide below the clamp (cell(ceil(log2(dt*hc/2))) >= dt), so the
        endpoint-pair test can only overstep once the cascade clamp binds;
        the cap removes that case. Returns (taus (T,), dtcs (T,)) numpy."""
        hc = self.grid_size // self.coarse_factor
        cap = 0.95 * 2.0 * min(2.0 ** (self.cascades - 1), self.bound) / hc
        span = 2.0 * _SQRT3 * max(self.bound, 1.0)
        if self.gamma_span > 0.0:
            span = min(span, self.gamma_span)
        taus, dtcs = [], []
        t = 0.0
        for _ in range(self.max_steps):  # bounded; real count is far smaller
            dtf = float(np.clip(t * self.dt_gamma, self.dt_min, self.dt_max))
            dtc = min(self.coarse_step_mult * dtf, max(cap, dtf))
            taus.append(t)
            dtcs.append(dtc)
            t += dtc
            if t > span:
                break
        return np.asarray(taus, np.float32), np.asarray(dtcs, np.float32)


def _ray_hash_u(rays_d) -> jnp.ndarray:
    """Deterministic per-ray uniform in [0, 1) from the direction bits
    (MarchConfig.stride_phase == "ray_hash"). Same ray -> same value every
    step; neighboring rays decorrelate through the float mantissa bits."""
    bits = jax.lax.bitcast_convert_type(
        rays_d.astype(jnp.float32), jnp.uint32)               # (N, 3)
    h = bits[:, 0] * np.uint32(_HASH_PRIMES[0])
    h = h ^ (bits[:, 1] * np.uint32(_HASH_PRIMES[1]))
    h = h ^ (bits[:, 2] * np.uint32(_HASH_PRIMES[2]))
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(2654435761)
    h = h ^ (h >> np.uint32(13))
    return (h >> np.uint32(8)).astype(jnp.float32) * np.float32(2.0**-24)


_HASH_PRIMES = (2654435761, 805459861, 3674653429)


def _mip_from_dt_static(dt, grid_size: int) -> np.ndarray:
    """mip_from_dt on the (static) dt ladder — trace-time numpy."""
    return np.maximum(
        np.ceil(np.log2(np.maximum(np.asarray(dt) * grid_size * 0.5, 1e-9))), 0
    ).astype(np.int32)


def mip_level(pos, dt, cfg: MarchConfig):
    """Cascade selection: max(mip_from_pos, mip_from_dt), clamped
    (reference raymarching.cu:44-56, 372-377).

    mip_from_pos uses threshold comparisons instead of log2 (2-3 compares on
    the VPU beat a transcendental at marching scale); mip_from_dt is folded
    at trace time when dt is static (the ladder always is).
    """
    mx = jnp.max(jnp.abs(pos), axis=-1)
    c_pos = jnp.zeros(mx.shape, jnp.int32)
    for i in range(cfg.cascades - 1):
        c_pos = c_pos + (mx > float(2**i)).astype(jnp.int32)
    if isinstance(dt, (float, int, np.ndarray)):
        c_dt = jnp.asarray(_mip_from_dt_static(dt, cfg.grid_size), jnp.int32)
    else:
        c_dt = jnp.maximum(
            jnp.ceil(jnp.log2(jnp.maximum(dt * cfg.grid_size * 0.5, 1e-9))), 0
        ).astype(jnp.int32)
    c = jnp.maximum(c_pos, c_dt)
    return jnp.minimum(c, cfg.cascades - 1).astype(jnp.int32)


def occupancy_lookup(bitfield, pos, dt, cfg: MarchConfig):
    """Test positions against the packed bitfield.

    bitfield: (cascades, H^3 // 8) uint8; pos: (..., 3); dt: broadcastable.
    Returns bool (...,). Row-major cell layout (models/occupancy.py).
    """
    H = cfg.grid_size
    if cfg.cascades == 1:
        # single-cascade fast path: no per-candidate mip math, 1-D gather
        cas_bound = min(1.0, cfg.bound)
        u = jnp.clip(pos / cas_bound * 0.5 + 0.5, 0.0, 1.0 - 1e-6)
        cell = (u * H).astype(jnp.int32)
        idx = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
        byte = bitfield[0, idx >> 3]
        return ((byte >> (idx & 7).astype(jnp.uint8)) & 1).astype(bool)
    cas = mip_level(pos, dt, cfg)
    cas_bound = jnp.minimum(2.0 ** cas.astype(jnp.float32), cfg.bound)
    u = jnp.clip(pos / cas_bound[..., None] * 0.5 + 0.5, 0.0, 1.0 - 1e-6)
    cell = (u * H).astype(jnp.int32)
    idx = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
    byte = bitfield[cas, idx >> 3]
    return ((byte >> (idx & 7).astype(jnp.uint8)) & 1).astype(bool)


def density_lookup(density_grid, pos, dt, cfg: MarchConfig):
    """Stored EMA density at each position's grid cell — the float analogue
    of occupancy_lookup. density_grid: (cascades, H^3) float32."""
    H = cfg.grid_size
    if cfg.cascades == 1:
        cas_bound = min(1.0, cfg.bound)
        u = jnp.clip(pos / cas_bound * 0.5 + 0.5, 0.0, 1.0 - 1e-6)
        cell = (u * H).astype(jnp.int32)
        idx = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
        return density_grid[0, idx]
    cas = mip_level(pos, dt, cfg)
    cas_bound = jnp.minimum(2.0 ** cas.astype(jnp.float32), cfg.bound)
    u = jnp.clip(pos / cas_bound[..., None] * 0.5 + 0.5, 0.0, 1.0 - 1e-6)
    cell = (u * H).astype(jnp.int32)
    idx = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
    return density_grid[cas, idx]


def proxy_terminate_valid(m, rays_o, rays_d, density_grid, cfg: MarchConfig,
                          grid_size: int | None = None):
    """Occlusion termination for marched samples, without evaluating the
    field: the reference's inference loop retires a ray once its
    transmittance drops under 1e-4 (raymarching.cu composite_rays, 829-922),
    so samples behind an opaque surface never reach the MLP. The static-shape
    TPU form masks them instead: gather the stored EMA density
    (models/occupancy.py, the same grid that drives the occupancy bits —
    values are SCALED density, sigma * density_scale) at each KEPT sample,
    accumulate a proxy transmittance along the ray, and invalidate samples
    past the proxy_thresh crossing. The EMA grid holds the MAX density seen
    per cell, so proxy opacity >= true opacity near convergence and
    termination is near-exact; early in training it can overestimate, which
    is why the trainer leaves this off (it is an inference feature, like the
    reference's alive-ray loop).

    CAVEAT (EMA-max grids): because the stored value is the MAX density seen
    anywhere in a cell, proxy opacity overestimates wherever a ray crosses
    the empty part of a partially-occupied cell — near silhouettes this can
    mask genuinely visible samples (unlike the reference's true composited-T
    retirement, raymarching.cu:829-922). `march()` therefore prefers the
    MIN-pooled coarse table (density_coarse_min; pass its grid_size here),
    which underestimates and is strictly conservative, matching
    march_rays_block's segment-level termination.

    Returns the updated valid mask (N, K). Cost: one (N*K) gather into the
    density table — one extra encode-level-equivalent."""
    cfg_l = cfg if grid_size is None else _with_grid_size(cfg, grid_size)
    pos = rays_o[:, None, :] + rays_d[:, None, :] * m["z"][..., None]
    pos = jnp.clip(pos, -cfg.bound, cfg.bound)
    sig = density_lookup(density_grid, pos, m["dt"], cfg_l)
    sig = jnp.where(m["valid"], jnp.maximum(sig, 0.0), 0.0)
    alpha = 1.0 - jnp.exp(-m["dt"] * sig)
    t = jnp.cumprod(1.0 - alpha + 1e-15, axis=-1)
    t_prev = jnp.concatenate([jnp.ones_like(t[:, :1]), t[:, :-1]], axis=-1)
    return m["valid"] & (t_prev > cfg.proxy_thresh)


def crop_near_far(near, far, rays_o, rays_d, crop_aabb):
    """Narrow an integration segment to a crop AABB
    [xmin,ymin,zmin,xmax,ymax,zmax] (the reference GUI's per-axis crop
    sliders narrow aabb_infer the same way, gui.py:293-320). Shared by the
    grid marchers and the dense render path."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    c0 = (crop_aabb[:3] - rays_o) * inv_d
    c1 = (crop_aabb[3:] - rays_o) * inv_d
    near = jnp.maximum(near, jnp.minimum(c0, c1).max(axis=-1))
    far = jnp.maximum(jnp.minimum(far, jnp.maximum(c0, c1).min(axis=-1)),
                      near)
    return near, far


def apply_z_window(near, far, z_window):
    """Narrow per-ray [near, far] to a depth window (z_lo, z_hi) — scalars
    or (N,) arrays. A window that excludes a ray entirely degenerates to an
    empty span (far == near), which every marcher masks to zero samples.
    (Kept general infrastructure: the deleted round-4 sequence renderer
    produced these; crop/GUI callers may too.)"""
    if z_window is None:
        return near, far
    z_lo, z_hi = z_window
    near = jnp.maximum(near, z_lo)
    far = jnp.maximum(jnp.minimum(far, z_hi), near)
    return near, far


def beam_contract_violation(rays_d, cfg: "MarchConfig",
                            n_check: int = 4096) -> float:
    """In-beam spread over the full march span, in coarse-cell units.

    The beam-shared phase A (MarchConfig.beam) is conservative ONLY while
    every member stays within one coarse cell of the beam ray — the 1-cell
    dilation's reach. A value > 1.0 means the contract is violated (e.g.
    scrambled ray order, a beam straddling a tile-row boundary, or a
    too-wide beam for the focal) and real segments can be silently dropped
    — the round-4 "beam-16 cliff" failure mode. Host-level guard: callers
    with concrete ray batches (render_full validates one chunk per frame
    shape) should refuse or step the beam down when this exceeds 1.

    Conservatively uses the worst member-vs-beam angle across the first
    n_check rays and the worst-case span 2*sqrt(3)*max(bound, 1)."""
    b = cfg.beam
    if b <= 1:
        return 0.0
    d = np.asarray(rays_d[: (min(n_check, rays_d.shape[0]) // b) * b],
                   np.float64)
    if d.shape[0] < b:
        return 0.0
    m = d.reshape(-1, b, 3)
    m = m / np.linalg.norm(m, axis=-1, keepdims=True)
    mean = m.sum(axis=1)
    mean /= np.maximum(np.linalg.norm(mean, axis=-1, keepdims=True), 1e-12)
    cos = np.clip((m * mean[:, None, :]).sum(-1), -1.0, 1.0)
    sin_max = float(np.sqrt(np.maximum(1.0 - cos * cos, 0.0)).max())
    z_max = 2.0 * math.sqrt(3.0) * max(cfg.bound, 1.0)
    cell = 2.0 * min(1.0, cfg.bound) / (cfg.grid_size // cfg.coarse_factor)
    return sin_max * z_max / cell


def near_far_aabb(rays_o, rays_d, bound: float, min_near: float,
                  crop_aabb=None):
    """Slab-test near/far against the bound cube, optionally intersected with
    a crop AABB (crop_near_far)."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (-bound - rays_o) * inv_d
    t1 = (bound - rays_o) * inv_d
    near = jnp.maximum(jnp.minimum(t0, t1).max(axis=-1), min_near)
    far = jnp.maximum(jnp.maximum(t0, t1).min(axis=-1), near)
    if crop_aabb is not None:
        near, far = crop_near_far(near, far, rays_o, rays_d, crop_aabb)
    return near, far


def _compact_first_k(occ, z, dtv, k, spread: bool = True, key=None,
                     first_frac: float | None = None, phase_u=None):
    """Keep k of each ray's True candidates under a static budget.

    occ: (N, T) bool; z: (N, T); dtv: (N, T) or (T,) broadcastable.
    Returns (z_buf, dt_buf, valid) each (N, k).

    spread=True (budget-adaptive stride): when a ray has more than k occupied
    candidates, every stride-th one is kept (stride = ceil(count/k)) and its
    dt is scaled by stride — the budget then SPANS the whole [near, far]
    segment instead of truncating at the first k samples. Truncation starves
    far geometry of gradient while the early occupancy grid is still dense
    (the field behind the cutoff never trains and the grid never carves); the
    reference never hits this because its per-ray cap is the full 1024 steps
    (raymarching.cu:314-495). As the grid converges, count <= k and the
    scheme reduces to exact first-k marching.

    key (optional PRNGKey) randomizes the stride PHASE per ray (stratified
    sampling): a fixed phase couples the sampled dt lattice to the density
    field itself, which slowly biases long training runs (observed as
    creeping density inflation); a random phase makes the thinned composite
    an unbiased estimator of the full-resolution one.

    Selection is rank-counting: after the stride mask at most k candidates
    remain, so the j-th kept candidate's column is `sum_t(cumsum(occ)[t] <
    j+1)` — an (N, T, k) compare + reduce, pure VPU. Replaced the earlier
    lax.top_k selection (which itself replaced cumsum-slot scatter, 3.4x):
    top_k lowers to a full sort and was costing more than the march's
    occupancy GATHERS (chip-measured ~2 ms per 4096 x 261 phase)."""
    n, t = occ.shape
    dtv = jnp.broadcast_to(dtv, (n, t))
    if t < k:  # fewer candidates than budget (tiny configs): pad
        pad = k - t
        occ = jnp.pad(occ, ((0, 0), (0, pad)))
        z = jnp.pad(z, ((0, 0), (0, pad)))
        dtv = jnp.pad(dtv, ((0, 0), (0, pad)))
        t = k
    if first_frac is not None:
        idx, valid, stride = _compact_idx_hybrid(occ, k, first_frac, key,
                                                 phase_u=phase_u)
    else:
        idx, valid, stride = _compact_idx(occ, k, spread, key,
                                          phase_u=phase_u)
    z_buf = jnp.where(valid, jnp.take_along_axis(z, idx, axis=1), 0.0)
    dt_buf = jnp.where(
        valid,
        jnp.take_along_axis(dtv, idx, axis=1) * stride.astype(dtv.dtype),
        0.0,
    )
    return z_buf, dt_buf, valid


def _compact_idx_hybrid(occ, k, frac: float, key=None, phase_u=None):
    """Front/tail hybrid compaction (MarchConfig.first_k): the first
    round(frac*k) occupied candidates at full resolution, the remaining
    budget stride-spread over the occupied candidates past them.

    Returns (idx (N,k), valid (N,k), stride (N,k) int32 per-slot dt scale —
    1 in the front section)."""
    n, t = occ.shape
    k_front = max(1, min(k, int(round(k * frac))))
    k_tail = k - k_front
    idx_f, valid_f, _ = _compact_idx(occ, k_front, spread=False)
    ones_f = jnp.ones((n, k_front), jnp.int32)
    if k_tail == 0:
        return idx_f, valid_f, ones_f
    cs = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    occ_tail = occ & (cs > k_front)
    # align the tail's stride phase to the END of the occupied span (keep
    # ranks cnt, cnt-s, ...): the front section covers the beginning, and a
    # start-aligned phase can drop up to stride-1 TRAILING candidates — a
    # grazing ray's far crossing vanished that way
    idx_t, valid_t, stride_t = _compact_idx(occ_tail, k_tail, spread=True,
                                            key=key, align_end=True,
                                            phase_u=phase_u)
    idx = jnp.concatenate([idx_f, idx_t], axis=1)
    valid = jnp.concatenate([valid_f, valid_t], axis=1)
    stride = jnp.concatenate(
        [ones_f, jnp.broadcast_to(stride_t, (n, k_tail))], axis=1
    )
    return idx, valid, stride


def _compact_idx(occ, k, spread: bool = True, key=None,
                 align_end: bool = False, phase_u=None):
    """Index form of _compact_first_k: returns (idx (N,k) int32 positions of
    the kept candidates, valid (N,k) bool, stride (N,1) int32 dt scale).
    align_end keeps the LAST occupied candidate on every ray (stride phase
    anchored to the back of the span instead of the front); ignored when a
    key supplies a stratified random phase.

    Callers whose z/dt are affine in the candidate index should reconstruct
    them arithmetically from idx instead of take_along_axis: XLA lowers
    take_along_axis to one gather row PER ELEMENT (~10 ns each), which
    chip-profiled as HALF the entire render time (fusion.9-12)."""
    n, t = occ.shape
    cs = jnp.cumsum(occ.astype(jnp.int32), axis=1)           # (N, T)
    stride = jnp.ones((n, 1), jnp.int32)
    if spread:
        cnt = cs[:, -1:]
        stride = jnp.maximum((cnt + k - 1) // k, 1)          # (N, 1)
        if phase_u is not None:
            # deterministic per-ray phase (MarchConfig.stride_phase
            # "ray_hash"); phase_u: (N,) uniform in [0, 1)
            phase = jnp.minimum(
                (phase_u[:, None] * stride.astype(jnp.float32)).astype(
                    jnp.int32), stride - 1)
        elif key is not None:
            phase = jax.random.randint(key, (n, 1), 0, 2**30) % stride
        elif align_end:
            phase = (jnp.maximum(cnt, 1) - 1) % stride
        else:
            phase = jnp.zeros((n, 1), stride.dtype)
        occ = occ & ((cs - 1) % stride == phase)
        cs = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)          # (k,)
    idx = jnp.sum(
        (cs[:, :, None] < targets[None, None, :]).astype(jnp.int32), axis=1
    )                                                        # (N, k)
    valid = targets[None, :] <= cs[:, -1:]
    idx = jnp.minimum(idx, t - 1)
    return idx, valid, stride


def _select_static_row(row_np, sel):
    """row_np: STATIC 1-D numpy row; sel: (N, k) int32 indices into it ->
    (N, k) float32. Unrolled compare+select against python scalars — zero
    gathers (jnp.take of even a tiny table lowers to one gather row per
    element on TPU). Trace cost: len(row_np) fused select ops."""
    out = jnp.zeros(sel.shape, jnp.float32)
    for s, v in enumerate(np.asarray(row_np, np.float32)):
        out = jnp.where(sel == s, jnp.float32(v), out)
    return out


def _select_minor(values, sel, width: int):
    """values (N, W), sel (N, k) ints in [0, W) -> (N, k): masked-sum select
    over the minor axis (pure VPU; take_along_axis would gather per element).
    """
    out = jnp.zeros(sel.shape, values.dtype)
    for s in range(width):
        out = out + jnp.where(sel == s, values[:, s : s + 1], 0)
    return out


def _phase_a_ladder(near, far, cfg: MarchConfig, round_to: int = 1):
    """Phase-A candidate ladder geometry shared by the byte and block
    two-phase marchers.

    Returns (z_a (N, T_A), dt_a, t_a): dt_a is a scalar float for the fixed
    ladder or an (N, 1) per-ray array when cfg.coarse_normalized.

    Normalized mode: the fixed ladder spends ceil(2*sqrt(3)*bound / dt_a)
    occupancy gathers per ray to cover the LONGEST possible AABB crossing,
    but a typical camera ray crosses ~55% of that — the tail candidates sit
    beyond `far` and are masked AFTER their gathers already ran
    (chip-profiled: the march is half the whole render and gather-bound).
    Instead each ray's ladder spans exactly [near, far]:
    dt_a = clamp((far-near)/T_A, base, cap) with a static
    T_A = ceil(span / cap), cap = min(safe, 2*base):
      * `safe` is just under one coarse cell edge — the endpoint-pair
        occupancy test (see below) cannot step over a whole cell, preserving
        the fixed ladder's no-miss guarantee;
      * `2*base` bounds the sampling-density loss: the worst (corner-to-
        corner) ray marches at most 2x coarser than the reference step —
        the analogue of the reference's dt_max clamp (raymarching.cu:348);
        a typical ray stays within ~15% of `base`.
    Short rays keep the reference step and mask their tail. Cuts phase-A
    candidates ~2x at bound=2 (256 -> ~128).

    t_a is rounded up to a multiple of `round_to` (anchor-run length)."""
    span = 2.0 * _SQRT3 * max(cfg.bound, 1.0)
    base = cfg.dt_min * cfg.coarse_step_mult
    if not cfg.coarse_normalized:
        t_a = int(np.ceil(span / base))
        t_a += (-t_a) % round_to
        taus = jnp.arange(t_a, dtype=jnp.float32) * base
        return near[:, None] + taus[None, :], base, t_a
    cap = _phase_a_cap(cfg)
    # dt_a derives from the UN-padded count so the anchor-run padding below
    # only appends masked tail steps — the byte and block marchers (different
    # round_to) must produce identical candidate geometry
    t_a0 = cfg.t_a0_steps or int(np.ceil(span / cap))
    t_a = t_a0 + (-t_a0) % round_to
    dt_a = jnp.clip((far - near)[:, None] / t_a0, base, cap)   # (N, 1)
    taus = jnp.arange(t_a, dtype=jnp.float32)
    z_a = near[:, None] + taus[None, :] * dt_a
    return z_a, dt_a, t_a


def _phase_a_cap(cfg: MarchConfig) -> float:
    """Largest phase-A step a normalized ladder may take (see
    _phase_a_ladder): one coarse cell edge for correctness, 2x the reference
    coarse step for sampling density."""
    base = cfg.dt_min * cfg.coarse_step_mult
    hc = cfg.grid_size // cfg.coarse_factor
    safe = 0.98 * 2.0 * min(1.0, cfg.bound) / hc
    return max(min(safe, 2.0 * base), base)


def full_ladder_steps(cfg: MarchConfig) -> int:
    """The auto normalized phase-A ladder length (_phase_a_ladder's t_a0):
    ceil(worst-case AABB crossing / cap). The scale against which window
    plans and t_a0_steps overrides are judged."""
    span = 2.0 * _SQRT3 * max(cfg.bound, 1.0)
    return int(np.ceil(span / _phase_a_cap(cfg)))


def phase_a_group_of(cfg: MarchConfig, bc: int = 8) -> int:
    """The anchor-run length the block marcher will use (mirrors
    march_rays_block's g_a computation; bc = coarse-table block edge)."""
    if cfg.phase_a_group > 0:
        return cfg.phase_a_group
    hc = cfg.grid_size // cfg.coarse_factor
    c0 = min(1.0, cfg.bound)
    base = cfg.dt_min * cfg.coarse_step_mult
    dt_a_max = _phase_a_cap(cfg) if cfg.coarse_normalized else base
    sb_world = bc * 2.0 * c0 / hc
    slack = 1.5 if cfg.coarse_normalized else 1.0
    return max(1, min(int(slack * sb_world / dt_a_max), 32))


def plan_occupied_crop(occ_grids, cfg: MarchConfig, pad_cells: int = 1):
    """Static march plan from the occupied-cell AABB.

    The phase-A ladder is statically sized for the worst-case crossing of
    the FULL [-bound, bound] cube (2*sqrt(3)*bound), but every valid sample
    lies inside an occupied fine cell — geometry outside the occupied AABB
    contributes nothing by construction. Intersecting rays with that AABB
    (crop_aabb) and shrinking the static ladder to its diagonal
    (t_a0_steps) cuts phase-A candidates with NO approximation: the sample
    set only loses candidates whose fine-occupancy test already returned
    empty. The reference has no analogue (its marcher's while-loop cost
    already scales with occupied length, raymarching.cu:372-404); this is
    the static-shape equivalent.

    occ_grids: (cascades, H^3) HOST array (numpy, bool/float) of fine
    occupancy, cascade c covering [-min(2^c, bound), +min(2^c, bound)]^3.
    Returns (crop_aabb (6,) float32 numpy, t_a0_steps int), or
    (None, 0) when nothing is occupied. Plan once per occupancy version —
    the t_a0_steps change recompiles the march.
    """
    h = cfg.grid_size
    occ = np.asarray(occ_grids).reshape(-1, h, h, h) > 0
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for c in range(occ.shape[0]):
        if not occ[c].any():
            continue
        cb = min(2.0**c, cfg.bound)
        cell = 2.0 * cb / h
        idx = np.argwhere(occ[c])
        lo = np.minimum(lo, (idx.min(0) - pad_cells) * cell - cb)
        hi = np.maximum(hi, (idx.max(0) + 1 + pad_cells) * cell - cb)
    if not np.isfinite(lo).all():
        return None, 0
    lo = np.maximum(lo, -cfg.bound)
    hi = np.minimum(hi, cfg.bound)
    diag = float(np.linalg.norm(hi - lo))
    cap = _phase_a_cap(cfg) if cfg.coarse_normalized else (
        cfg.dt_min * cfg.coarse_step_mult)
    auto = int(np.ceil(2.0 * _SQRT3 * max(cfg.bound, 1.0) / cap))
    # +2: near-jitter (one step) and the endpoint-or segment test
    t_a0 = min(auto, int(np.ceil(diag / cap)) + 2)
    # Ladder-shape cliff (chip sweep, RESULTS.md): the block marcher's
    # anchor-run COUNT t_a/g_a must not fall under 8 — run counts of 5-7
    # compile ~2x slower than the same march at 8 runs, and 8 runs beat
    # the auto 9-10 by ~20%. Round the ladder UP to 8 full runs; the extra
    # candidates are far-masked and still cheaper than the slow shape.
    g_a = phase_a_group_of(cfg)
    t_a0 = max(t_a0, 8 * g_a)
    return np.concatenate([lo, hi]).astype(np.float32), t_a0


def plan_occupied_ladder(occ_grids, cfg: MarchConfig, pad_cells: int = 1):
    """Ladder-only variant of plan_occupied_crop: shrink the static phase-A
    ladder WITHOUT intersecting rays with the crop AABB.

    The crop intersection chip-measured ~15% SLOWER than the bare ladder
    shrink at equal t_a0 (it concentrates the anchor gathers on distinct
    occupied block rows instead of repeated empty ones), so the preferred
    plan keeps near/far at the full cube and only bounds the ladder LENGTH:
    any ray's occupied content ends by its occupied-AABB exit, and
    (t_exit_aabb - t_entry_cube) <= max over cube-corner x aabb-corner
    distances — an exact upper bound on the span the ladder must cover.
    Returns t_a0_steps (int; 0 when nothing is occupied), rounded up to 8
    anchor runs (the ladder-shape cliff) and capped at the auto ladder.
    """
    aabb, _ = plan_occupied_crop(occ_grids, cfg, pad_cells)
    if aabb is None:
        return 0
    lo, hi = aabb[:3], aabb[3:]
    b = cfg.bound
    cube = np.array([[x, y, z] for x in (-b, b) for y in (-b, b)
                     for z in (-b, b)])
    ac = np.array([[p[0], q[1], r[2]] for p in (lo, hi) for q in (lo, hi)
                   for r in (lo, hi)])
    span = float(np.sqrt(((cube[:, None, :] - ac[None, :, :]) ** 2)
                         .sum(-1).max()))
    cap = _phase_a_cap(cfg) if cfg.coarse_normalized else (
        cfg.dt_min * cfg.coarse_step_mult)
    auto = int(np.ceil(2.0 * _SQRT3 * max(cfg.bound, 1.0) / cap))
    t_a0 = min(auto, int(np.ceil(span / cap)) + 2)
    g_a = phase_a_group_of(cfg)
    if -(-t_a0 // g_a) < 8:          # under the cliff: pad to 8 full runs
        t_a0 = 8 * g_a
    return min(t_a0, auto)


def plan_gamma_span(occ_grids, cfg: MarchConfig, pad_cells: int = 1):
    """Gamma-ladder analogue of plan_occupied_ladder: bound the STATIC gamma
    ladder's span (MarchConfig.gamma_span) by the occupied geometry.

    The gamma ladders measure tau from each ray's cube entry, and any ray's
    occupied content ends by its occupied-AABB exit, so
    (t_exit_aabb - t_entry_cube) <= max over cube-corner x aabb-corner
    distances — the identical exact bound the gamma=0 plan uses for its step
    count, in world units because the gamma ladder's steps are non-uniform.
    Margin: one dt_min of near jitter plus one top-cascade coarse step (the
    endpoint-pair test's reach past the truncation point). Returns the span
    float (0.0 = nothing occupied / no shrink available); apply with
    dataclasses.replace(cfg, gamma_span=span). Plan once per occupancy
    version — a span change recompiles the march.
    """
    aabb, _ = plan_occupied_crop(occ_grids, cfg, pad_cells)
    full = 2.0 * _SQRT3 * max(cfg.bound, 1.0)
    if aabb is None:
        return 0.0
    lo, hi = aabb[:3], aabb[3:]
    b = cfg.bound
    cube = np.array([[x, y, z] for x in (-b, b) for y in (-b, b)
                     for z in (-b, b)])
    ac = np.array([[p[0], q[1], r[2]] for p in (lo, hi) for q in (lo, hi)
                   for r in (lo, hi)])
    span = float(np.sqrt(((cube[:, None, :] - ac[None, :, :]) ** 2)
                         .sum(-1).max()))
    hc = cfg.grid_size // cfg.coarse_factor
    cap = 0.95 * 2.0 * min(2.0 ** (cfg.cascades - 1), cfg.bound) / hc
    return float(min(span + cfg.dt_min + cap, full))


def autotune_march_shape(occupancy, cfg: MarchConfig, rays_o, rays_d,
                         chunk: int = 4096, iters: int = 3,
                         candidates=None, verbose: bool = False):
    """Measure-and-pick the phase-A compile shape (g_a, t_a0) on the live
    device.

    The ladder-shape cliff (RESULTS.md round 2) showed the march's cost is
    dominated by its COMPILE SHAPE: the same candidate ladder at 5-7 anchor
    runs is ~2x slower than at 8, 8 beats 9-10 by ~20%, and the optimum
    moved with scene/bound. Static heuristics (runs >= 8 cap, occupied-
    ladder plan) recover most of it; this autotuner measures a handful of
    (g_a, t_a0) shapes on real rays + the real occupancy and returns the
    fastest — one march-only compile + ~3 timed runs per shape, a few
    minutes once per (scene, frame shape) with the compilation cache warm.

    occupancy: occupancy dict (block tables required). rays_o/rays_d: frame
    rays; the first `chunk` (spatially coherent order preferred) are the
    probe workload. candidates: optional [(g_a, t_a0), ...] override.
    Returns (best_cfg, results) where results = [(g_a, t_a0, ms), ...].
    """
    import dataclasses
    import time

    assert isinstance(occupancy, dict) and "blocks" in occupancy, \
        "autotune needs block occupancy tables"
    ro, rd = rays_o[:chunk], rays_d[:chunk]
    if candidates is None:
        g_auto = phase_a_group_of(cfg)
        cap = _phase_a_cap(cfg) if cfg.coarse_normalized else (
            cfg.dt_min * cfg.coarse_step_mult)
        auto = int(np.ceil(2.0 * _SQRT3 * max(cfg.bound, 1.0) / cap))
        # occupied-ladder plan as the t_a0 anchor when host occupancy exists
        t_plan = 0
        try:
            occ_host = np.unpackbits(
                np.asarray(occupancy["bitfield"]), axis=-1,
                bitorder="little")
            t_plan = plan_occupied_ladder(occ_host, cfg)
        except Exception:
            pass
        t_base = t_plan or auto
        # per target run count, the tightest group that still covers the
        # required span: g = ceil(t_base / runs), ladder = runs * g — lands
        # exactly on `runs` anchor runs with full coverage. Plus the current
        # heuristic shape (g_auto + runs>=8 cap) as the incumbent.
        candidates = []
        for runs in (8, 9, 10):
            g = max(2, -(-t_base // runs))
            candidates.append((g, runs * g))
        g_inc = max(1, min(g_auto, -(-t_base // 8)))
        candidates.append((g_inc, -(-t_base // g_inc) * g_inc))
        seen = set()
        candidates = [c for c in candidates
                      if not (c in seen or seen.add(c))]

    results = []
    for g_a, t_a0 in candidates:
        cfg_c = dataclasses.replace(cfg, phase_a_group=g_a, t_a0_steps=t_a0)

        @jax.jit
        def probe(a, b, cfg_c=cfg_c):
            m = march(a, b, occupancy, cfg_c)
            return m["z"].sum() + m["dt"].sum() + m["valid"].sum()

        probe(ro, rd).block_until_ready()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            probe(ro, rd).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[len(ts) // 2] * 1e3
        results.append((g_a, t_a0, ms))
        if verbose:
            print(f"autotune g_a={g_a} t_a0={t_a0}: {ms:.2f} ms")
    g_b, t_b, _ = min(results, key=lambda r: r[2])
    return dataclasses.replace(cfg, phase_a_group=g_b, t_a0_steps=t_b), results


def march_rays_two_phase(rays_o, rays_d, bitfield, bitfield_coarse,
                         cfg: MarchConfig, key=None, crop_aabb=None,
                         z_window=None):
    """Coarse-to-fine two-phase march.

    Phase A walks a sparse ladder (coarse_step_mult * dt_min, or the static
    gamma ladder when cfg.dt_gamma > 0 — adaptive stepping,
    raymarching.cu:347-369) against the
    maxpooled coarse bitfield and keeps the first K_A occupied segments;
    phase B subdivides only those segments at dt_min against the fine
    bitfield. Cuts occupancy-gather volume ~T/(T_A + K_A*mult) (~6x) versus
    the single-phase marcher — the TPU replacement for the CUDA marcher's
    per-ray empty-space skip loop (raymarching.cu:372-404), whose work also
    scales with occupied length rather than total length.
    """
    import dataclasses

    n = rays_o.shape[0]
    dt = cfg.dt_min
    gamma = cfg.dt_gamma > 0.0

    near, far = near_far_aabb(rays_o, rays_d, cfg.bound, cfg.min_near,
                              crop_aabb)
    near, far = apply_z_window(near, far, z_window)
    k_phase = None
    if key is not None:
        key, k_phase = jax.random.split(key)
        near = near + jax.random.uniform(key, (n,)) * dt

    cfg_coarse = dataclasses.replace(
        cfg, grid_size=cfg.grid_size // cfg.coarse_factor
    )
    if gamma:
        # adaptive stepping: static trace-time gamma ladder (see
        # MarchConfig.coarse_gamma_ladder); dt varies per candidate, and the
        # occupancy test's mip rides mip_from_dt, folded at trace time from
        # the static dt row
        taus_a, dts_a = cfg.coarse_gamma_ladder
        z_a = near[:, None] + jnp.asarray(taus_a)[None, :]   # (N, T_A)
        dt_a = dts_a                                         # static (T_A,)
    else:
        z_a, dt_a, t_a = _phase_a_ladder(near, far, cfg)     # (N, T_A)
    pos_a = rays_o[:, None, :] + rays_d[:, None, :] * z_a[..., None]
    occ_a = occupancy_lookup(bitfield_coarse, pos_a, dt_a, cfg_coarse)
    # a segment [z_i, z_i + dt_a) is kept if EITHER endpoint lands in an
    # occupied coarse cell — occupancy transitions inside a segment would
    # otherwise be missed by the start-point sample alone
    occ_next = jnp.concatenate(
        [occ_a[:, 1:], jnp.zeros_like(occ_a[:, :1])], axis=1
    )
    occ_a = (occ_a | occ_next) & (z_a < far[:, None])
    za_buf, dta_buf, valid_a = _compact_first_k(
        occ_a, z_a, dt_a, cfg.coarse_segments
    )

    # phase B: subdivide each kept segment over its (possibly stride-scaled)
    # length. When phase A overflows its budget, _compact_first_k thins
    # segments and scales their dt — subdividing the SCALED length keeps the
    # fine candidates spanning the whole occupied range (coarser sampling)
    # instead of leaving unsampled z-gaps between thinned segments.
    mult = cfg.coarse_step_mult
    sub = dta_buf[:, :, None] / mult                        # (N, K_A, 1)
    offs = jnp.arange(mult, dtype=jnp.float32)
    z_b = (za_buf[:, :, None] + offs[None, None, :] * sub).reshape(n, -1)
    dt_fine = jnp.broadcast_to(
        sub, (n, cfg.coarse_segments, mult)
    ).reshape(n, -1)
    pos_b = rays_o[:, None, :] + rays_d[:, None, :] * z_b[..., None]
    # gamma: the fine step varies per segment, so mip rides the per-candidate
    # dt (sub stays under the cascade-0 fine cell edge by the phase-A cap)
    occ_b = occupancy_lookup(bitfield, pos_b, dt_fine if gamma else dt, cfg)
    valid_ab = jnp.broadcast_to(
        valid_a[:, :, None], (n, cfg.coarse_segments, mult)
    ).reshape(n, -1)
    occ_b = occ_b & valid_ab & (z_b < far[:, None])
    phase_u = (_ray_hash_u(rays_d)
               if (k_phase is not None and cfg.stride_phase == "ray_hash")
               else None)
    z_buf, dt_buf, valid = _compact_first_k(
        occ_b, z_b, dt_fine, cfg.samples_per_ray, key=k_phase,
        first_frac=cfg.first_k_frac if cfg.first_k else None,
        phase_u=phase_u,
    )
    return {"z": z_buf, "dt": dt_buf, "valid": valid, "near": near, "far": far}


def _block_coords(pos, dt_static, grid_size: int, cfg: MarchConfig,
                  block: int = 4):
    """Per-position (flat block row id incl. cascade, local bit) for a
    block-packed occupancy table of `grid_size`^3 cells (ops/morton.py
    pack_blocks layout: block^3-cell tiles)."""
    nb = grid_size // block
    shift = block.bit_length() - 1          # log2(block), block power of 2
    mask = block - 1
    cas = mip_level(pos, dt_static, _with_grid_size(cfg, grid_size))
    cas_bound = jnp.minimum(2.0 ** cas.astype(jnp.float32), cfg.bound)
    u = jnp.clip(pos / cas_bound[..., None] * 0.5 + 0.5, 0.0, 1.0 - 1e-6)
    cell = (u * grid_size).astype(jnp.int32)
    bx, by, bz = cell[..., 0] >> shift, cell[..., 1] >> shift, cell[..., 2] >> shift
    lx, ly, lz = cell[..., 0] & mask, cell[..., 1] & mask, cell[..., 2] & mask
    flat = (cas * (nb**3)) + ((bx * nb) + by) * nb + bz
    local = ((lx * block) + ly) * block + lz
    return flat, local


def _with_grid_size(cfg: MarchConfig, grid_size: int) -> MarchConfig:
    if cfg.grid_size == grid_size:
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, grid_size=grid_size)


def _grouped_block_test(table, flat, local, group: int, anchors=None):
    """Occupancy bits for (N, T) positions from a block-packed table with
    anchor-row reuse: positions are grouped in runs of `group` along T; only
    the anchor rows per run are gathered (2-3: ends + middle when group > 4;
    measured 1.6x faster end-to-end than 4) and every position extracts its
    bit from whichever anchor shares its block row. Unmatched positions (the
    run crossed 2+ block planes between anchors — rare by construction, the
    caller sizes `group` so a run spans less than one block) are
    conservatively occupied: a false positive only spends sample budget,
    never drops real geometry.

    table: (R, W) uint32 rows; flat, local: (N, T) int32, T % group == 0.
    anchors: optional in-run anchor offsets (default by group size).
    """
    from nerfnav_tpu.ops.morton import block_bit_lookup

    n, t = flat.shape
    g = group
    w = table.shape[-1]
    if g <= 1:
        rows = jnp.take(table, flat.reshape(-1), axis=0).reshape(n, t, w)
        return block_bit_lookup(rows, local)
    f = flat.reshape(n, t // g, g)
    l = local.reshape(n, t // g, g)
    if anchors is None:
        anchors = [0, g - 1] if g <= 4 else [0, g // 2, g - 1]
    occ = jnp.ones(f.shape, bool)
    matched = jnp.zeros(f.shape, bool)
    for a in anchors:
        fa = f[:, :, a]
        rows = jnp.take(table, fa.reshape(-1), axis=0).reshape(n, t // g, w)
        hit = f == fa[:, :, None]
        bit = block_bit_lookup(rows[:, :, None, :], l)
        occ = jnp.where(hit & ~matched, bit, occ)
        matched = matched | hit
    return occ.reshape(n, t)


def dilate_blocks_coarse(blocks_coarse, hc: int, bc: int):
    """1-cell 3D or-pool dilation of a block-packed coarse occupancy table
    (cascades, (hc/bc)^3, bc^3/32) -> same shape. The beam-shared phase A
    tests the BEAM ray against this table so that every member's own cells
    are covered (MarchConfig.beam conservatism contract). Tiny (cascades x
    hc^3 bools) — build it ONCE per occupancy version and pass it to march
    via occupancy["blocks_coarse_dilated"]; rebuilding per chunk serializes
    ~0.3-0.8 ms of small-tensor work into every marched chunk."""
    from nerfnav_tpu.ops.morton import pack_blocks as _pack_blocks
    from nerfnav_tpu.ops.morton import unpack_blocks as _unpack_blocks

    casc = blocks_coarse.shape[0]
    g = _unpack_blocks(blocks_coarse, hc).reshape(casc, hc, hc, hc)
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0)))
    g = gp[:, :-2] | gp[:, 1:-1] | gp[:, 2:]
    gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
    g = gp[:, :, :-2] | gp[:, :, 1:-1] | gp[:, :, 2:]
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1)))
    g = gp[..., :-2] | gp[..., 1:-1] | gp[..., 2:]
    return _pack_blocks(g.reshape(casc, -1), hc, block=bc)


def march_rays_block(rays_o, rays_d, blocks, blocks_coarse, cfg: MarchConfig,
                     key=None, density_coarse_min=None, crop_aabb=None,
                     z_window=None, stop_after: str = "",
                     blocks_coarse_dilated=None, phase_a=None):
    """Two-phase march against 64-bit block-packed occupancy rows.

    Same candidate geometry as march_rays_two_phase (phase A: dt_a ladder vs
    the maxpooled coarse grid; phase B: dt subdivision of kept segments vs the
    fine grid) but every occupancy test gathers a 64-bit block row shared by
    a RUN of consecutive samples instead of one byte per sample
    (_grouped_block_test). Cuts march gather rows ~3x: the reference's
    empty-space-skip loop reads one uint8 per step (raymarching.cu:372-404);
    on TPU a gather costs ~5 ns per row regardless of width, so wide rows +
    VPU bit extraction are the idiomatic replacement.

    blocks: (cascades, (H/4)^3, 2) uint32; blocks_coarse:
    (cascades, (H/cf/bc)^3, bc^3/32) uint32 (ops/morton.py pack_blocks;
    the coarse table is packed with the widest block the grid admits —
    8^3 = 512-bit rows double the anchor-run span at identical test
    resolution and misprediction geometry).

    dt_gamma > 0 (adaptive stepping, reference raymarching.cu:347-369): the
    phase-A ladder becomes the STATIC trace-time gamma ladder
    (MarchConfig.coarse_gamma_ladder — dt grows with t, capped under one
    top-cascade coarse cell) and phase B subdivides each kept segment by its
    own dtc. Anchor runs are sized by the ladder's LARGEST step, so runs
    near the camera span less than one block (tighter matching, never
    wrong); the occupancy test's mip rides the per-candidate static dt row.
    z/dt reconstruction takes from the small static ladder rows instead of
    the affine formula.
    """
    from nerfnav_tpu.ops.morton import block_size_of

    gamma = cfg.dt_gamma > 0.0
    n = rays_o.shape[0]
    h = cfg.grid_size
    hc = h // cfg.coarse_factor
    bc = block_size_of(blocks_coarse)   # coarse table block edge (cells)
    dt = cfg.dt_min
    mult = cfg.coarse_step_mult
    base = dt * mult
    c0 = min(1.0, cfg.bound)
    # largest phase-A step any ray can take — sizes the anchor runs and the
    # fine-run length below
    if gamma:
        taus_np, dtcs_np = cfg.coarse_gamma_ladder
        dt_a_max = float(dtcs_np.max())
    else:
        dt_a_max = _phase_a_cap(cfg) if cfg.coarse_normalized else base

    # run lengths: a run must span about one block of the table it tests.
    # Normalized ladders size runs 1.5x looser: a TYPICAL ray steps well
    # under dt_a_max, and the rare over-long run degrades to
    # conservative-occupied (phase B's exact fine test still rejects).
    sb_world = bc * 2.0 * c0 / hc       # coarse block edge, world units
    fb_world = 8.0 * c0 / h             # fine block edge (cascade 0)
    slack = 1.5 if cfg.coarse_normalized else 1.0
    g_a = max(1, min(int(slack * sb_world / dt_a_max), 32))
    if cfg.phase_a_group > 0:
        g_a = cfg.phase_a_group
    elif gamma:
        # ladder-shape cliff applies regardless of ladder kind: keep >= 8
        # anchor runs
        g_a = max(1, min(g_a, -(-len(taus_np) // 8)))
    elif cfg.coarse_normalized:
        # Ladder-shape cliff (chip sweep, RESULTS.md round-2): marches whose
        # anchor-run count t_a/g_a lands in 5-7 compile ~2x SLOWER than the
        # same candidate ladder at >=8 runs (and 8 runs beat 9-10 by ~20%).
        # Cap the run length so the ladder always splits into >=8 runs —
        # shorter runs only tighten the anchor-match geometry (fewer
        # conservative-occupied fallbacks), so correctness is unaffected.
        # At bound=1 (every training config) this turns the auto 5-run
        # t_a~65 ladder into 8 runs of 8.
        span = 2.0 * _SQRT3 * max(cfg.bound, 1.0)
        t_a0_est = cfg.t_a0_steps or int(np.ceil(span / dt_a_max))
        g_a = max(1, min(g_a, -(-t_a0_est // 8)))
    g_b = 1
    for d in (2, 4, 8):
        if mult % d == 0 and (d - 1) * (dt_a_max / mult) < fb_world:
            g_b = d

    near, far = near_far_aabb(rays_o, rays_d, cfg.bound, cfg.min_near,
                              crop_aabb)
    near, far = apply_z_window(near, far, z_window)
    k_phase = None
    if key is not None:
        key, k_phase = jax.random.split(key)
        near = near + jax.random.uniform(key, (n,)) * dt

    k_a = cfg.coarse_segments
    if phase_a is not None:
        # Frame-level phase-A split (round 5): za/dt/valid come from ONE
        # frame-wide march(..., stop_after="phase_a") instead of being
        # recomputed inside every chunk of the render scan. Rationale
        # (chip attribution): at beam 8 the per-chunk phase A runs 512-wide
        # — a chain of ~40 small serialized ops whose fixed issue overheads
        # cost ~4x the proportional work; at frame width (80k beams) the
        # same chain runs once at full utilization. Deterministic eval only
        # (key is ignored: the frame-level phase A already owns the
        # stratified phase); dt_gamma unsupported (its phase B consumes
        # per-candidate ladder rows that do not round-trip the buffers).
        if gamma:
            raise ValueError(
                "phase_a split is unsupported with dt_gamma > 0")
        za_buf = phase_a["z"]
        dta_buf = phase_a["dt"]
        valid_a = phase_a["valid"]
        # phase B still needs the beam width (beam segments can start
        # before THIS member's AABB entry -> the z_b >= near mask below)
        mB = cfg.beam if (cfg.beam > 1 and n % cfg.beam == 0) else 1
    else:
        # ---- phase A: coarse segments
        k_a = cfg.coarse_segments
        tbl_coarse = blocks_coarse.reshape(-1, blocks_coarse.shape[-1])

        # ---- beam sharing (MarchConfig.beam): phase A runs once per beam of
        # mB consecutive rays against the 1-cell-dilated coarse table; the kept
        # segments broadcast to members and phase B tests the exact fine grid
        # per ray. oA/dA/nearA/farA/nA shadow the ray arrays for everything up
        # to the phase-A -> phase-B hand-off (za_buf / dta_buf / valid_a).
        mB = cfg.beam if (cfg.beam > 1 and n % cfg.beam == 0) else 1
        nA, oA, dA, nearA, farA = n, rays_o, rays_d, near, far
        if mB > 1:
            nA = n // mB
            oA = rays_o.reshape(nA, mB, 3)[:, 0]
            dm = jnp.sum(rays_d.reshape(nA, mB, 3), axis=1)
            dA = dm / jnp.maximum(
                jnp.linalg.norm(dm, axis=-1, keepdims=True), 1e-12)
            nearA = near.reshape(nA, mB).min(axis=1)
            farA = far.reshape(nA, mB).max(axis=1)
            # 1-cell-dilated coarse table: guarantees the beam-ray test covers
            # every member's own cells while in-beam spread stays under one
            # coarse cell (see MarchConfig.beam). Prefer a PRECOMPUTED table
            # (occupancy dict key "blocks_coarse_dilated", built once per
            # occupancy version by dilate_blocks_coarse): recomputing the
            # or-pool + repack inside every marched chunk is a chain of small
            # serialized ops that round-5 chip attribution caught dominating
            # the beamed phase A (the "hoisted by XLA LICM" assumption did not
            # hold across lax.map chunk bodies in every program).
            if blocks_coarse_dilated is not None:
                tbl_coarse = blocks_coarse_dilated.reshape(
                    -1, blocks_coarse.shape[-1])
            else:
                tbl_coarse = dilate_blocks_coarse(blocks_coarse, hc, bc).reshape(
                    -1, blocks_coarse.shape[-1])
        if gamma:
            # static gamma ladder, padded to whole anchor runs with far-masked
            # tail steps (taus keep growing at the final dtc)
            t_g = len(taus_np)
            pad = (-t_g) % g_a
            if pad:
                taus_np = np.concatenate(
                    [taus_np,
                     taus_np[-1] + dtcs_np[-1] * np.arange(1, pad + 1,
                                                           dtype=np.float32)])
                dtcs_np = np.concatenate(
                    [dtcs_np, np.full(pad, dtcs_np[-1], np.float32)])
            z_a = nearA[:, None] + jnp.asarray(taus_np)[None, :]  # (N_A, T_A)
            pos_a = oA[:, None, :] + dA[:, None, :] * z_a[..., None]
            # per-candidate static dt row: mip_from_dt folds at trace time
            flat_a, local_a = _block_coords(pos_a, dtcs_np, hc, cfg, block=bc)
            anchors_a = [0, g_a - 1] if (cfg.coarse_anchors == 2 and g_a > 1) \
                else None
            occ_a = _grouped_block_test(tbl_coarse, flat_a, local_a, g_a,
                                        anchors=anchors_a)
            occ_next = jnp.concatenate(
                [occ_a[:, 1:], jnp.zeros_like(occ_a[:, :1])], axis=1)
            occ_a = (occ_a | occ_next) & (z_a < farA[:, None])
            idx_a, valid_a, stride_a = _compact_idx(occ_a, k_a)
            # z/dt reconstruction from the SMALL static ladder rows (z is no
            # longer affine in the index under gamma). The rows are STATIC
            # numpy — select by unrolled compare+select against python
            # scalars (pure VPU) instead of jnp.take: the takes were
            # 2 x k_a gather rows per ray, and the round-5 gamma stage
            # split put phase A at 3.2x its gamma=0 cost with these on
            # the critical path.
            tau_sel = _select_static_row(taus_np, idx_a)
            dtc_sel = _select_static_row(dtcs_np, idx_a)
            za_buf = jnp.where(valid_a, nearA[:, None] + tau_sel, 0.0)
            dta_buf = jnp.where(
                valid_a, dtc_sel * stride_a.astype(jnp.float32), 0.0)
        elif cfg.a0_segments > 0 and cfg.coarse_normalized:
            # ---- phase A0: super-coarse block spans (see MarchConfig.a0_segments)
            # One bool per coarse-block ROW: "any of the bc^3 cells occupied" —
            # a (cascades * nb^3,) table small enough to live in VMEM and gather
            # per candidate directly.
            any_tbl = jnp.any(tbl_coarse != 0, axis=-1)
            # FIXED step of one coarse-block edge (unlike phase A there is no
            # normalization win at ~15 candidates, and a fixed dt_a0 keeps the
            # kept spans' phase-A subdivision exactly at the dt_a_max ladder)
            dt_a0 = 0.98 * sb_world
            span = 2.0 * _SQRT3 * max(cfg.bound, 1.0)
            t_a0 = int(np.ceil(span / dt_a0))
            cap0 = dt_a0
            z_a0 = nearA[:, None] + jnp.arange(t_a0, dtype=jnp.float32) * dt_a0
            pos_a0 = oA[:, None, :] + dA[:, None, :] * z_a0[..., None]
            flat_a0, _ = _block_coords(pos_a0, dt_a0, hc, cfg, block=bc)
            occ_a0 = jnp.take(any_tbl, flat_a0.reshape(-1)).reshape(flat_a0.shape)
            occ_a0 = (
                occ_a0
                | jnp.concatenate(
                    [occ_a0[:, 1:], jnp.zeros_like(occ_a0[:, :1])], axis=1)
            ) & (z_a0 < farA[:, None])
            k_a0 = cfg.a0_segments
            idx_a0, valid_a0, stride_a0 = _compact_idx(occ_a0, k_a0)
            z0_buf = jnp.where(valid_a0, nearA[:, None] + idx_a0 * dt_a0, 0.0)
            dt0_buf = jnp.where(
                valid_a0, dt_a0 * stride_a0.astype(jnp.float32), 0.0)

            # cell-exact phase A only INSIDE kept spans: mult0+1 test points per
            # span (the +1 closes the endpoint-or at span boundaries); a span is
            # one coarse block by construction, so [0, mult0] end anchors cover
            # its (at most 2) block rows.
            mult0 = int(np.ceil(cap0 / dt_a_max - 1e-6))
            sub0 = dt0_buf[:, :, None] / mult0                       # (N, K0, 1)
            jj = jnp.arange(mult0 + 1, dtype=jnp.float32)
            z_t = (z0_buf[:, :, None] + jj[None, None, :] * sub0)    # (N,K0,m0+1)
            pos_t = oA[:, None, None, :] + dA[:, None, None, :] \
                * z_t[..., None]
            dt_t = jnp.broadcast_to(sub0, z_t.shape).reshape(nA, -1)
            flat_t, local_t = _block_coords(
                pos_t.reshape(nA, -1, 3), dt_t, hc, cfg, block=bc)
            occ_t = _grouped_block_test(
                tbl_coarse, flat_t, local_t, mult0 + 1, anchors=[0, mult0]
            ).reshape(nA, k_a0, mult0 + 1)
            occ_a = occ_t[:, :, :-1] | occ_t[:, :, 1:]               # (N,K0,m0)
            # A stride-widened A0 span subdivides to a test spacing of
            # stride*dt_a0/mult0 > one coarse cell edge: the endpoint-pair test
            # could then step OVER an occupied cell between two test points (a
            # hole — worse than conservative). Treat widened spans as occupied
            # throughout; phase A-exactness is preserved for the common
            # stride-1 spans and overflow only ADDS candidates.
            occ_a = occ_a | (stride_a0[:, :, None] > 1)
            z_a_start = z_t[:, :, :-1]
            occ_a = occ_a & valid_a0[:, :, None] \
                & (z_a_start < farA[:, None, None])
            idx_a, valid_a, stride_a = _compact_idx(
                occ_a.reshape(nA, k_a0 * mult0), k_a)
            seg0 = idx_a // mult0
            off0 = (idx_a % mult0).astype(jnp.float32)
            z0_sel = _select_minor(z0_buf, seg0, k_a0)
            sub0_sel = _select_minor(sub0[:, :, 0], seg0, k_a0)
            za_buf = jnp.where(valid_a, z0_sel + off0 * sub0_sel, 0.0)
            dta_buf = jnp.where(
                valid_a, sub0_sel * stride_a.astype(jnp.float32), 0.0)
        else:
            z_a, dt_a, t_a = _phase_a_ladder(nearA, farA, cfg, round_to=g_a)
            anchors_a = None
            if cfg.coarse_anchors == 2 and g_a > 1:
                anchors_a = [0, g_a - 1]
            pos_a = oA[:, None, :] + dA[:, None, :] * z_a[..., None]
            flat_a, local_a = _block_coords(pos_a, dt_a, hc, cfg, block=bc)
            zin_a = z_a < farA[:, None]
            occ_a = _grouped_block_test(tbl_coarse, flat_a, local_a,
                                        g_a, anchors=anchors_a)
            occ_next = jnp.concatenate(
                [occ_a[:, 1:], jnp.zeros_like(occ_a[:, :1])], axis=1
            )
            occ_a = (occ_a | occ_next) & zin_a
            # z along the phase-A ladder is affine in the candidate index, so the
            # compaction returns INDICES and z/dt are reconstructed
            # arithmetically — take_along_axis here lowers to one gather row per
            # element and chip-profiled as half the whole render (_compact_idx).
            if cfg.coarse_first_k:
                idx_a, valid_a, stride_a = _compact_idx_hybrid(
                    occ_a, k_a, cfg.first_k_frac)
            else:
                idx_a, valid_a, stride_a = _compact_idx(occ_a, k_a)
            za_buf = jnp.where(valid_a, nearA[:, None] + idx_a * dt_a, 0.0)
            dta_buf = jnp.where(valid_a, dt_a * stride_a.astype(jnp.float32), 0.0)

        if cfg.proxy_terminate and density_coarse_min is not None:
            # SEGMENT-level occlusion termination (see proxy_terminate_valid for
            # the transmittance rationale): one gather per kept segment (K_A/ray,
            # into the small hc^3 min-pooled table) instead of one per phase-B
            # candidate (chip-measured 3x SLOWER via the 2M-row fine grid).
            # Masking segments BEFORE phase B concentrates the whole K budget in
            # front of the surface. The min-pool underestimates the density along
            # any path through a coarse tile, so termination is conservative —
            # it only fires behind tiles that are dense THROUGHOUT.
            z_mid = za_buf + 0.5 * dta_buf
            pos_seg = oA[:, None, :] + dA[:, None, :] * z_mid[..., None]
            cfg_c = _with_grid_size(cfg, hc)
            proxy_tbl = density_coarse_min
            if mB > 1:
                # Beam mode runs the proxy transmittance along the BEAM ray, so
                # its conservative contract needs the MIN over the same 1-cell
                # neighborhood the occupancy dilation uses: a member whose path
                # crosses adjacent, less-dense cells must not see its far
                # segments terminated by the beam ray's denser column. Separable
                # 3^3 min-pool (+inf pad: out-of-grid neighbors cannot lower a
                # cell); like the or-pool above, it depends only on the table
                # and is hoisted by XLA.
                casc = density_coarse_min.shape[0]
                dmn = density_coarse_min.reshape(casc, hc, hc, hc)
                inf = jnp.float32(jnp.inf)
                dp = jnp.pad(dmn, ((0, 0), (1, 1), (0, 0), (0, 0)),
                             constant_values=inf)
                dmn = jnp.minimum(jnp.minimum(dp[:, :-2], dp[:, 1:-1]), dp[:, 2:])
                dp = jnp.pad(dmn, ((0, 0), (0, 0), (1, 1), (0, 0)),
                             constant_values=inf)
                dmn = jnp.minimum(jnp.minimum(dp[:, :, :-2], dp[:, :, 1:-1]),
                                  dp[:, :, 2:])
                dp = jnp.pad(dmn, ((0, 0), (0, 0), (0, 0), (1, 1)),
                             constant_values=inf)
                dmn = jnp.minimum(jnp.minimum(dp[..., :-2], dp[..., 1:-1]),
                                  dp[..., 2:])
                proxy_tbl = dmn.reshape(density_coarse_min.shape)
            sig = density_lookup(proxy_tbl, pos_seg, dt_a_max, cfg_c)
            sig = jnp.where(valid_a, jnp.maximum(sig, 0.0), 0.0)
            a_seg = 1.0 - jnp.exp(-dta_buf * sig)
            t = jnp.cumprod(1.0 - a_seg + 1e-15, axis=-1)
            t_prev = jnp.concatenate([jnp.ones_like(t[:, :1]), t[:, :-1]],
                                     axis=-1)
            valid_a = valid_a & (t_prev > cfg.proxy_thresh)

        if mB > 1:
            # beam -> members: each member ray inherits the beam's kept segment
            # z-intervals (distances along its OWN direction — the <=1-cell
            # divergence is absorbed by the dilated phase-A test); pure
            # broadcast, no gathers
            za_buf = jnp.repeat(za_buf, mB, axis=0)
            dta_buf = jnp.repeat(dta_buf, mB, axis=0)
            valid_a = jnp.repeat(valid_a, mB, axis=0)

        if stop_after == "phase_a":
            # profiling hook (benchmarks/profile_render.py): everything through
            # the phase-A compaction + beam broadcast, nothing of phase B —
            # trace-time branch, zero cost when unused
            return {"z": za_buf, "dt": dta_buf, "valid": valid_a,
                    "near": near, "far": far}

    # ---- phase B: fine subdivision over each kept segment's (possibly
    # stride-scaled) length — see march_rays_two_phase on overflow gaps.
    # Stride-widened runs may exceed the anchor reach; those positions fall
    # back to conservative-occupied, which only adds samples.
    sub = dta_buf[:, :, None] / mult                        # (N, K_A, 1)
    offs = jnp.arange(mult, dtype=jnp.float32)
    z_b = (za_buf[:, :, None] + offs[None, None, :] * sub).reshape(n, -1)
    pos_b = rays_o[:, None, :] + rays_d[:, None, :] * z_b[..., None]
    if gamma:
        # adaptive stepping: the fine step varies per segment, so the fine
        # occupancy test's mip rides the per-candidate dt (matches the byte
        # gamma marcher, march_rays_two_phase)
        dt_fine = jnp.broadcast_to(sub, (n, k_a, mult)).reshape(n, -1)
        flat_b, local_b = _block_coords(pos_b, dt_fine, h, cfg)
    else:
        flat_b, local_b = _block_coords(pos_b, dt, h, cfg)
    # fine runs span < 40% of a fine block: 2 end anchors suffice
    occ_b = _grouped_block_test(blocks.reshape(-1, 2), flat_b, local_b, g_b,
                                anchors=[0, g_b - 1] if g_b > 1 else None)
    valid_ab = jnp.broadcast_to(
        valid_a[:, :, None], (n, k_a, mult)
    ).reshape(n, -1)
    occ_b = occ_b & valid_ab & (z_b < far[:, None])
    if mB > 1:
        # a beam segment can start before THIS member's AABB entry (beam
        # near = min over members); positions before it sit outside the
        # AABB and must not shade
        occ_b = occ_b & (z_b >= near[:, None])
    if stop_after == "phase_b_occ":
        # profiling hook: phase A + the phase-B fine occupancy test, without
        # the final sample compaction/reconstruction
        return {"z": z_b, "dt": jnp.zeros_like(z_b), "valid": occ_b,
                "near": near, "far": far}
    # reconstruct kept z/dt from indices: seg = idx // mult selects among
    # K_A per-ray segment scalars (masked-sum select, no gathers)
    phase_u = (_ray_hash_u(rays_d)
               if (k_phase is not None and cfg.stride_phase == "ray_hash")
               else None)
    if cfg.first_k:
        idx_b, valid, stride_b = _compact_idx_hybrid(
            occ_b, cfg.samples_per_ray, cfg.first_k_frac, key=k_phase,
            phase_u=phase_u)
    else:
        idx_b, valid, stride_b = _compact_idx(occ_b, cfg.samples_per_ray,
                                              key=k_phase, phase_u=phase_u)
    seg = idx_b // mult
    off = (idx_b % mult).astype(jnp.float32)
    za_sel = _select_minor(za_buf, seg, k_a)
    sub_sel = _select_minor(sub[:, :, 0], seg, k_a)
    z_buf = jnp.where(valid, za_sel + off * sub_sel, 0.0)
    dt_buf = jnp.where(valid, sub_sel * stride_b.astype(jnp.float32), 0.0)
    return {"z": z_buf, "dt": dt_buf, "valid": valid, "near": near, "far": far}


def march_rays(rays_o, rays_d, bitfield, cfg: MarchConfig, key=None,
               crop_aabb=None, z_window=None):
    """March N rays through the occupancy grid.

    Returns dict:
      z:     (N, K) sample distances (0 in padding slots)
      dt:    (N, K) marching step sizes at each sample
      valid: (N, K) bool sample mask
    K = cfg.samples_per_ray. Deterministic unless `key` (perturbed start,
    reference raymarching.cu:489 PCG32 equivalent).
    """
    n = rays_o.shape[0]
    k = cfg.samples_per_ray
    taus, dts = cfg.ladder
    taus = jnp.asarray(taus)
    dts_l = jnp.asarray(dts)
    t_c = taus.shape[0]

    near, far = near_far_aabb(rays_o, rays_d, cfg.bound, cfg.min_near,
                              crop_aabb)
    near, far = apply_z_window(near, far, z_window)
    k_phase = None
    if key is not None:
        key, k_phase = jax.random.split(key)
        near = near + jax.random.uniform(key, (n,)) * cfg.dt_min

    z = near[:, None] + taus[None, :]                     # (N, T)
    pos = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    occ = occupancy_lookup(bitfield, pos, dts, cfg)  # numpy dts: static mip
    occ = occ & (z < far[:, None])
    phase_u = (_ray_hash_u(rays_d)
               if (k_phase is not None and cfg.stride_phase == "ray_hash")
               else None)
    z_buf, dt_buf, valid = _compact_first_k(
        occ, z, dts_l[None, :], k, key=k_phase,
        first_frac=cfg.first_k_frac if cfg.first_k else None,
        phase_u=phase_u)
    return {"z": z_buf, "dt": dt_buf, "valid": valid, "near": near, "far": far}


def march_segments(rays_o, rays_d, occupancy, cfg: MarchConfig,
                   crop_aabb=None):
    """Phase A ONLY, reduced: per-ray occupied depth extent — the cheap
    conservative probe window planners march at
    low resolution. Returns {"z_first", "z_last", "hit"} each (N,).

    The reductions run on the UN-compacted candidate lattice: the budgeted
    compaction (_compact_first_k) start-aligns its overflow stride and can
    drop TRAILING occupied candidates past a gap, which would make z_last
    non-conservative (far geometry clipped out of the planned window).

    Requires a coarse occupancy mirror: the phase-A ladder steps at up to one
    COARSE cell edge, whose endpoint-pair test has no no-miss guarantee
    against the fine bitfield."""
    if isinstance(occupancy, dict):
        coarse = occupancy.get("bitfield_coarse")
    else:
        coarse = None
    if coarse is None:
        raise ValueError(
            "march_segments needs occupancy['bitfield_coarse'] — the fine "
            "bitfield alone cannot be probed safely at coarse ladder steps")
    import dataclasses

    near, far = near_far_aabb(rays_o, rays_d, cfg.bound, cfg.min_near,
                              crop_aabb)
    cfg_l = dataclasses.replace(cfg,
                                grid_size=cfg.grid_size // cfg.coarse_factor)
    z_a, dt_a, _ = _phase_a_ladder(near, far, cfg)
    pos_a = rays_o[:, None, :] + rays_d[:, None, :] * z_a[..., None]
    occ_a = occupancy_lookup(coarse, pos_a, dt_a, cfg_l)
    occ_next = jnp.concatenate(
        [occ_a[:, 1:], jnp.zeros_like(occ_a[:, :1])], axis=1)
    occ_a = (occ_a | occ_next) & (z_a < far[:, None])
    dt_b = jnp.broadcast_to(dt_a, z_a.shape)
    z_first = jnp.min(jnp.where(occ_a, z_a, jnp.inf), axis=1)
    z_last = jnp.max(jnp.where(occ_a, z_a + dt_b, -jnp.inf), axis=1)
    return {"z_first": z_first, "z_last": z_last,
            "hit": jnp.any(occ_a, axis=1)}


def march(rays_o, rays_d, occupancy, cfg: MarchConfig, key=None,
          crop_aabb=None, z_window=None, stop_after: str = "",
          phase_a=None):
    """Dispatch: block-packed two-phase march when 64-bit block tables are
    available (fastest; handles dt_gamma == 0 and the adaptive dt_gamma > 0
    static gamma ladder), byte-bitfield two-phase when a coarse mirror is
    available, single-phase ladder otherwise.

    occupancy: occupancy-state dict (models/occupancy.py) or a bare
    (cascades, H^3//8) bitfield array. When cfg.proxy_terminate, samples
    occluded past cfg.proxy_thresh are invalidated: the block marcher
    terminates at SEGMENT level pre-compaction via the dict's
    density_coarse_min table (concentrating the K budget in front of the
    surface); the other marchers mask post-compaction via density_grid.
    Density tables hold SCALED density (sigma * density_scale)."""
    if isinstance(occupancy, dict):
        bitfield = occupancy["bitfield"]
        coarse = occupancy.get("bitfield_coarse")
        blocks = occupancy.get("blocks")
        blocks_coarse = occupancy.get("blocks_coarse")
        density_grid = occupancy.get("density_grid")
        density_coarse_min = occupancy.get("density_coarse_min")
        blocks_coarse_dilated = occupancy.get("blocks_coarse_dilated")
    else:
        bitfield, coarse, blocks, blocks_coarse = occupancy, None, None, None
        density_grid = density_coarse_min = blocks_coarse_dilated = None
    if blocks is not None and blocks_coarse is not None:
        # the block marcher handles dt_gamma > 0 via the static gamma ladder
        # (per-candidate dt row; anchor runs sized by the ladder tail)
        return march_rays_block(rays_o, rays_d, blocks, blocks_coarse, cfg,
                                key, density_coarse_min=density_coarse_min,
                                crop_aabb=crop_aabb, z_window=z_window,
                                stop_after=stop_after,
                                blocks_coarse_dilated=blocks_coarse_dilated,
                                phase_a=phase_a)
    if coarse is not None:
        m = march_rays_two_phase(rays_o, rays_d, bitfield, coarse, cfg, key,
                                 crop_aabb=crop_aabb, z_window=z_window)
    else:
        m = march_rays(rays_o, rays_d, bitfield, cfg, key,
                       crop_aabb=crop_aabb, z_window=z_window)
    if cfg.proxy_terminate:
        # prefer the min-pooled coarse table: strictly conservative (see
        # proxy_terminate_valid's EMA-max silhouette caveat)
        if density_coarse_min is not None:
            m = {**m, "valid": proxy_terminate_valid(
                m, rays_o, rays_d, density_coarse_min, cfg,
                grid_size=cfg.grid_size // cfg.coarse_factor)}
        elif density_grid is not None:
            m = {**m, "valid": proxy_terminate_valid(
                m, rays_o, rays_d, density_grid, cfg)}
    return m
