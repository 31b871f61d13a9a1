"""Frame-coherent sequence rendering: the previous frame IS the prepass.

Camera-path rendering (eval video, GUI orbits, the nav agent's observation
stream — reference test->mp4 utils.py:588-636 and test_gui utils.py:703-752)
renders a SMOOTH pose sequence: consecutive frames see almost the same
geometry at almost the same depth. The static phase-A ladder, in contrast,
re-pays the worst-case occupied-span march every frame (~97 candidates/ray
after plan_occupied_ladder; chip-profiled at ~48% of the frame,
benchmarks/RESULTS.md round-2 profile).

This module reuses each frame's rendered depth to bound the next frame's
march: per-tile [z_lo, z_hi] depth windows (3x3-tile dilated, padded by a
motion margin) drive a SHORT static ladder (t_a0 ~ 24 vs ~97) for every tile
whose window is trustworthy, and the ordinary full-ladder program re-renders
the rest. Window extraction costs one tiny jitted reduction — unlike the
depth-prepass planner (models/prepass.py) there is no paid probe march,
which is exactly the regime where that idea wins.

Trust rule (conservative by construction): a tile is windowed only when
every ray in its 3x3 tile neighborhood terminated essentially opaque
(weights_sum > hit_thresh) in the previous frame AND the dilated depth span
plus margins fits the short ladder's reach. Anything else — background sky,
silhouettes against background, disocclusion fronts, freshly entered frame
borders — falls back to the exact full-ladder render. Correctness therefore
degrades in only one way: geometry that moves more than `margin` world units
per frame ahead of a tracked surface can be clipped for one frame (the
weights_sum drop marks the tile full again the next frame — self-healing).
The per-frame PSNR-vs-full parity check lives in bench.py --seq_check and
tests/test_sequence.py.

The reference has no analogue: its CUDA inference loop re-marches every
frame from scratch (renderer.py:325-374); frame coherence is a TPU-shaped
win because the march cost here is a STATIC ladder length chosen at trace
time — exactly the thing a depth window can shrink.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.ops.marching import MarchConfig, _phase_a_cap


@dataclasses.dataclass(frozen=True)
class SequenceConfig:
    """Knobs for SequenceRenderer (defaults chip-swept; see RESULTS.md).

    t_a0_win: short-ladder length for windowed tiles. 24 keeps >= 8
        anchor runs (the ladder-shape cliff) at g_a = 3 and reaches
        ~22 * cap world units — enough for silhouette tiles plus margins.
    margin_cells: window padding in coarse-cell edges, each side. Covers
        (a) surface thickness beyond the expected-depth estimate and (b)
        per-frame depth motion; raise it for fast camera paths.
    hit_thresh: previous-frame weights_sum above which a ray counts as
        opaque-terminated (the reference retires rays at T < 1e-4,
        raymarching.cu:829-922; 0.995 leaves headroom for bf16 tables).
    win_segments: phase-A segment budget (coarse_segments) inside the
        window; 0 keeps the full-march value.
    full_group: chunks per full-ladder dispatch group (invalid tiles are
        re-rendered in fixed-size groups so the program count stays static).
    """

    t_a0_win: int = 24
    margin_cells: float = 4.0
    hit_thresh: float = 0.995
    win_segments: int = 0
    full_group: int = 8
    round_samples: int = 8
    round_compact: int = 4
    shade_order: str = "ray"
    bg_color: float = 1.0


class SequenceRenderer:
    """Renders a pose sequence chunk-by-tile with previous-frame depth reuse.

    Usage:
        sr = SequenceRenderer(field, occupancy, mcfg, H, W, cfg)
        for pose in orbit:
            img, stats = sr.render(rays_o, rays_d)   # ROW-MAJOR rays
        sr.reset()                                   # new sequence / teleport

    Compiles exactly THREE programs regardless of sequence length: the
    windowed all-chunks scan, the full-ladder group, and the window plan.
    """

    def __init__(self, field, occupancy, mcfg: MarchConfig, H: int, W: int,
                 cfg: SequenceConfig = SequenceConfig(), tile: int = 64):
        if not mcfg.coarse_normalized or mcfg.dt_gamma != 0.0:
            raise ValueError(
                "SequenceRenderer needs the normalized phase-A ladder "
                "(coarse_normalized=True, dt_gamma=0) — t_a0_steps is "
                "ignored by the fixed and gamma ladders")
        self.H, self.W, self.tile = H, W, tile
        self.cfg = cfg
        self.chunk = tile * tile
        # partial edge tiles (e.g. 800 = 12.5 x 64): pad the tile grid by
        # CLAMP-REPLICATING edge rays so every chunk is one full tile — the
        # replicated rays render real edge content, so tile depth windows
        # stay meaningful; the padded rows/cols are cropped from the output
        self.Hp = -(-H // tile) * tile
        self.Wp = -(-W // tile) * tile
        self.ny, self.nx = self.Hp // tile, self.Wp // tile
        self.m = self.ny * self.nx
        from nerfnav_tpu.data.rays import tile_order

        perm, inv = tile_order(self.Hp, self.Wp, tile)
        if (self.Hp, self.Wp) != (H, W):
            yy = np.minimum(np.arange(self.Hp), H - 1)
            xx = np.minimum(np.arange(self.Wp), W - 1)
            src = (yy[:, None] * W + xx[None, :]).reshape(-1)
            perm = src[perm]
        self._perm = jnp.asarray(perm)
        self._inv = jnp.asarray(inv)

        cap = _phase_a_cap(mcfg)
        # reach margin: one ladder step for the near jitter, one for the
        # endpoint-or segment test
        self.w_cap = (cfg.t_a0_win - 2) * cap
        hc = mcfg.grid_size // mcfg.coarse_factor
        self.margin = cfg.margin_cells * 2.0 * min(1.0, mcfg.bound) / hc

        win_cfg = dataclasses.replace(
            mcfg, t_a0_steps=cfg.t_a0_win,
            coarse_segments=(cfg.win_segments or mcfg.coarse_segments))

        from nerfnav_tpu.models.renderer import render_rays_grid_rounds

        def chunk_out(mc, ro, rd, zw):
            out = render_rays_grid_rounds(
                field, occupancy, mc, ro, rd, bg_color=cfg.bg_color,
                round_samples=cfg.round_samples,
                round_compact=cfg.round_compact,
                shade_order=cfg.shade_order, z_window=zw)
            return out["image"], out["depth"], out["weights_sum"]

        @jax.jit
        def win_scan(ro_s, rd_s, zlo, zhi):
            """All m chunks in one dispatch; invalid slots carry an empty
            window (zlo == zhi == 0 -> every candidate masked, rounds all
            skip) so their cost is the short march only."""
            return jax.lax.map(
                lambda a: chunk_out(win_cfg, a[0], a[1], (a[2], a[3])),
                (ro_s, rd_s, zlo, zhi))

        @jax.jit
        def full_group(ro_g, rd_g):
            return jax.lax.map(
                lambda a: chunk_out(mcfg, a[0], a[1], None), (ro_g, rd_g))

        w_cap, margin = self.w_cap, self.margin
        ny, nx, m, chunk = self.ny, self.nx, self.m, self.chunk

        @jax.jit
        def plan(depth, wsum):
            """Per-chunk (z_lo, z_hi, valid) from the previous frame's
            buffers (m, chunk). Tiles are chunk slots (tile_order is
            ty-major), so the 3x3 dilation is a reshape to (ny, nx)."""
            hit = jnp.all(wsum > cfg.hit_thresh, axis=1).reshape(ny, nx)
            dmin = jnp.min(depth, axis=1).reshape(ny, nx)
            dmax = jnp.max(depth, axis=1).reshape(ny, nx)

            def dil(x, op, fill):
                xp = jnp.pad(x, 1, constant_values=fill)
                rows = [xp[dy:dy + ny, dx:dx + nx]
                        for dy in range(3) for dx in range(3)]
                return op(jnp.stack(rows), axis=0)

            # frame-edge tiles have no outer neighbor to vouch for incoming
            # geometry -> padding `hit` with False keeps them on the exact
            # full path
            hit9 = dil(hit, jnp.min, False)
            zlo9 = dil(dmin, jnp.min, jnp.inf) - margin
            zhi9 = dil(dmax, jnp.max, -jnp.inf) + margin
            valid = hit9 & ((zhi9 - zlo9) <= w_cap)
            zlo = jnp.where(valid, jnp.maximum(zlo9, 0.0), 0.0).reshape(m)
            zhi = jnp.where(valid, zhi9, 0.0).reshape(m)
            return zlo, zhi, valid.reshape(m)

        self._win_fn, self._full_fn, self._plan_fn = win_scan, full_group, plan
        self._depth = None
        self._wsum = None

    def reset(self):
        """Drop the depth history (scene edit, teleport, occupancy update)."""
        self._depth = None
        self._wsum = None

    def render(self, rays_o, rays_d):
        """rays_o/rays_d: (H*W, 3) ROW-MAJOR. Returns (image (H, W, 3),
        depth (H, W), stats dict); device arrays. Frame 0 (or after reset)
        renders fully exact."""
        g = self.cfg.full_group
        ro = jnp.take(rays_o, self._perm, axis=0).reshape(self.m, self.chunk, 3)
        rd = jnp.take(rays_d, self._perm, axis=0).reshape(self.m, self.chunk, 3)

        if self._wsum is None:
            valid_np = np.zeros(self.m, bool)
            zlo = zhi = jnp.zeros((self.m,), jnp.float32)
        else:
            zlo, zhi, valid = self._plan_fn(self._depth, self._wsum)
            valid_np = np.asarray(valid)

        if valid_np.any():
            img, dep, ws = self._win_fn(ro, rd, zlo, zhi)
        else:
            img = jnp.zeros((self.m, self.chunk, 3), jnp.float32)
            dep = jnp.zeros((self.m, self.chunk), jnp.float32)
            ws = jnp.zeros((self.m, self.chunk), jnp.float32)

        inv_idx = np.nonzero(~valid_np)[0]
        for s in range(0, len(inv_idx), g):
            ids = inv_idx[s:s + g]
            # pad the last group by repeating its first chunk — the
            # duplicate scatter writes identical values
            ids_p = np.concatenate([ids, np.repeat(ids[:1], g - len(ids))])
            ids_j = jnp.asarray(ids_p)
            img_g, dep_g, ws_g = self._full_fn(
                jnp.take(ro, ids_j, axis=0), jnp.take(rd, ids_j, axis=0))
            img = img.at[ids_j].set(img_g)
            dep = dep.at[ids_j].set(dep_g)
            ws = ws.at[ids_j].set(ws_g)

        self._depth, self._wsum = dep, ws
        out = jnp.take(img.reshape(-1, 3), self._inv, axis=0)
        out = out.reshape(self.Hp, self.Wp, 3)[: self.H, : self.W]
        dep_out = jnp.take(dep.reshape(-1), self._inv, axis=0)
        dep_out = dep_out.reshape(self.Hp, self.Wp)[: self.H, : self.W]
        stats = {"n_win": int(valid_np.sum()),
                 "n_full": int(self.m - valid_np.sum())}
        return out, dep_out, stats
