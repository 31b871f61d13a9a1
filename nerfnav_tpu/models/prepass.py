"""Depth-prepass planner: bound each image tile's occupied-depth window with
a low-resolution phase-A march, then render every tile chunk with the
smallest phase-A ladder that still covers its window.

Why: the normalized phase-A ladder (ops/marching.py _phase_a_ladder) already
spans exactly [near, far] per ray, but its STATIC length T_A is sized for the
worst-case AABB crossing (~114 candidates at bound 2) while a converged
scene's occupied depth range at any given tile is usually a thin slab a few
coarse cells deep. Phase A's cost (ladder arithmetic, block-row bit
extraction, compaction) is ~linear in T_A and chip-profiled at ~1/3 of the
whole render — so marching a stride-subsampled ray grid once (~1-2% of frame
cost), reducing the hits to per-tile [z_lo, z_hi] windows, and dispatching
each chunk to a T_A bucket collapses that cost for surface tiles and skips
empty tiles outright.

Conservativeness: the prepass tests the same coarse occupancy tables phase A
uses. An occupied coarse cell (edge 2*bound/(H/cf) world units) projects to
a screen footprint many times the prepass stride for any cell closer than
the far plane, so with one-tile dilation the per-tile windows cover every
cell a full-resolution ray in that tile can hit — except degenerate slivers
(an isolated surface seen almost exactly edge-on, thinner on screen than the
stride, with no other geometry in the 3x3-tile neighborhood). The margin and
`stride` knobs trade prepass cost against that tail; the equivalence test
(tests/test_prepass.py) pins the windows' containment of the control march's
samples on representative scenes.

The reference has no analogue (its CUDA marcher skips empty space per ray,
paying per-step bitfield reads, raymarching.cu:372-404); this is
TPU-structural: fewer candidates per program, chosen per tile, at the cost
of a handful of compiled bucket programs.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.ops.marching import (
    MarchConfig,
    _phase_a_cap,
    march_segments,
)

_SQRT3 = math.sqrt(3.0)


def full_ladder_steps(cfg: MarchConfig) -> int:
    """The auto phase-A ladder length (_phase_a_ladder's t_a0)."""
    span = 2.0 * _SQRT3 * max(cfg.bound, 1.0)
    return int(np.ceil(span / _phase_a_cap(cfg)))


class DepthPrepass:
    """Per-frame tile depth planner for a fixed image/chunk geometry.

    Usage (see bench.py --prepass and tests/test_prepass.py):
        dp = DepthPrepass(mcfg, H, W, perm, chunk)
        plan = dp.plan(occupancy, rays_o, rays_d)   # row-major full-res rays
        for c, (t_a0, z_lo, z_hi) in enumerate(plan):
            if t_a0 == 0:  -> background chunk, skip dispatch
            else:          -> render with dataclasses.replace(mcfg,
                              t_a0_steps=t_a0) and z_window=(z_lo, z_hi)

    perm: the tile-major permutation the caller renders in
    (data/rays.py tile_order); chunk: rays per dispatch. Chunks may straddle
    tiles — the plan unions the windows of every tile a chunk touches.
    """

    def __init__(self, mcfg: MarchConfig, H: int, W: int, perm, chunk: int,
                 tile: int = 64, stride: int = 8, margin_cells: float = 2.0,
                 bucket_divs=(8, 4, 2, 1)):
        if not mcfg.coarse_normalized or mcfg.dt_gamma != 0.0:
            raise ValueError(
                "DepthPrepass needs the normalized phase-A ladder "
                "(coarse_normalized=True, dt_gamma=0) — t_a0_steps buckets "
                "are ignored by the fixed and gamma ladders")
        self.mcfg = mcfg
        self.H, self.W, self.chunk, self.tile = H, W, chunk, tile
        self.cap = _phase_a_cap(mcfg)
        self.t_full = full_ladder_steps(mcfg)
        self.buckets = sorted({max(1, -(-self.t_full // d))
                               for d in bucket_divs})
        hc = mcfg.grid_size // mcfg.coarse_factor
        cell = 2.0 * min(1.0, mcfg.bound) / hc
        self.margin = margin_cells * cell

        # prepass ray subgrid (row-major indices)
        ys = np.arange(0, H, stride)
        xs = np.arange(0, W, stride)
        self.sub_idx = (ys[:, None] * W + xs[None, :]).reshape(-1)
        self.sub_ty = np.repeat(ys // tile, len(xs))
        self.sub_tx = np.tile(xs // tile, len(ys))
        self.ny, self.nx = -(-H // tile), -(-W // tile)

        # chunk -> touched tiles (perm positions past H*W are padding)
        n = H * W
        tile_of = (perm // W) // tile * self.nx + (perm % W) // tile
        n_chunks = -(-n // chunk)
        self.chunk_tiles = [
            np.unique(tile_of[c * chunk: min((c + 1) * chunk, n)])
            for c in range(n_chunks)
        ]

        sub = jnp.asarray(self.sub_idx)
        # subgrid select runs ON DEVICE inside the jitted probe — shipping
        # the full (H*W, 3) ray arrays to host every frame would cost more
        # than the probe itself
        self._seg_fn = jax.jit(
            lambda ro, rd, occ: march_segments(
                jnp.take(ro, sub, axis=0), jnp.take(rd, sub, axis=0),
                occ, mcfg))

    def plan(self, occupancy, rays_o, rays_d):
        """occupancy: state dict; rays_o/rays_d: (H*W, 3) ROW-MAJOR.
        Returns [(t_a0, z_lo, z_hi)] per chunk; t_a0 == 0 means the chunk's
        3x3-dilated tile neighborhood saw no occupancy — render background."""
        seg = self._seg_fn(jnp.asarray(rays_o), jnp.asarray(rays_d),
                           occupancy)
        zf = np.asarray(seg["z_first"])
        zl = np.asarray(seg["z_last"])
        hit = np.asarray(seg["hit"])

        # per-tile reduction
        ny, nx = self.ny, self.nx
        t_lo = np.full(ny * nx, np.inf, np.float64)
        t_hi = np.full(ny * nx, -np.inf, np.float64)
        tid = self.sub_ty * nx + self.sub_tx
        np.minimum.at(t_lo, tid[hit], zf[hit])
        np.maximum.at(t_hi, tid[hit], zl[hit])

        # 3x3 dilation over the tile grid (edge-clamped)
        lo2 = t_lo.reshape(ny, nx)
        hi2 = t_hi.reshape(ny, nx)
        lo_p = np.pad(lo2, 1, mode="edge")
        hi_p = np.pad(hi2, 1, mode="edge")
        lo_d = np.full_like(lo2, np.inf)
        hi_d = np.full_like(hi2, -np.inf)
        for dy in range(3):
            for dx in range(3):
                lo_d = np.minimum(lo_d, lo_p[dy:dy + ny, dx:dx + nx])
                hi_d = np.maximum(hi_d, hi_p[dy:dy + ny, dx:dx + nx])
        lo_d, hi_d = lo_d.reshape(-1), hi_d.reshape(-1)

        plan = []
        for tiles in self.chunk_tiles:
            z_lo = lo_d[tiles].min()
            z_hi = hi_d[tiles].max()
            if not np.isfinite(z_lo):
                plan.append((0, 0.0, 0.0))
                continue
            z_lo = max(z_lo - self.margin, 0.0)
            z_hi = z_hi + self.margin
            needed = int(np.ceil((z_hi - z_lo) / self.cap))
            t = next((b for b in self.buckets if b >= needed), self.t_full)
            plan.append((t, float(z_lo), float(z_hi)))
        return plan
