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
motion margin) route every tile to the SMALLEST static ladder that covers
its window — a narrow ladder (t_a0 ~24, one whole-frame scan) for thin
surface tiles, a wide ladder (t_a0 ~48, fixed-size chunk groups) for
silhouette-span tiles — and the ordinary full-ladder program re-renders the
rest. Window extraction costs one tiny jitted reduction — unlike the
depth-prepass planner (models/prepass.py, DELETED end of round 3: it never
beat the occ-ladder baseline once whole-frame scan landed) there is no
paid probe march.

Trust rule (conservative by construction): a tile is windowed only when
every ray in its 3x3 tile neighborhood terminated essentially opaque
(weights_sum > hit_thresh) in the previous frame AND the dilated depth span
plus margins fits a window ladder's reach. Anything else — background sky,
silhouettes against background, disocclusion fronts, freshly entered frame
borders — falls back to the exact full-ladder render. Correctness therefore
degrades in only one way: geometry that moves more than `margin` world units
per frame ahead of a tracked surface can be clipped for one frame (the
weights_sum drop marks the tile full again the next frame — self-healing).
Chip parity: 98.9 dB min PSNR vs the exact path over a 24-pose orbit
(bench.py --seq_check); the CPU tests pin the same plus self-healing.

Dispatch economy (the first chip cut measured 2.25M rays/s — SLOWER than
the 3.3M single-pose scan — almost entirely from per-frame dispatch and
merge overhead): group renders take the whole frame's ray stack plus a
chunk-id vector and scatter their output into DONATED frame buffers, so a
steady-state frame is ~6 dispatches (ray gen, narrow scan, ~3 wide/full
groups, plan) and one host sync for the plan.

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

    t_a0_win / t_a0_wide: static ladder lengths for the window buckets.
        Both keep >= 8 anchor runs (the ladder-shape cliff). The wide
        bucket is OFF by default (t_a0_wide = 0): its fused group programs
        chain through the donated frame buffers and SERIALIZE (chip: more
        wide tiles made frames slower despite less march work) — a single
        longer narrow ladder in the one whole-frame scan wins instead.
    thickness_cells / motion_cells: window padding in coarse-cell edges,
        each side. thickness covers surface extent beyond the expected-
        depth estimate (lag-independent); motion covers per-frame depth
        drift and scales by plan_lag. Raise motion_cells for fast paths.
    hit_thresh: previous-frame weights_sum above which a ray counts as
        opaque-terminated (the reference retires rays at T < 1e-4,
        raymarching.cu:829-922; 0.995 leaves headroom for bf16 tables).
    win_segments: phase-A segment budget (coarse_segments) inside the
        narrow window; 0 keeps the full-march value.
    win_k: per-ray sample budget (samples_per_ray) inside the narrow
        window; 0 keeps the full-march value.
    group: chunks per wide/full dispatch group (windowed-out tiles are
        re-rendered in fixed-size groups so the program count stays
        static; the last group pads by repeating a chunk id).
    plan_lag: how many frames old the window plan may be. 1 = plan from
        the previous frame, but the plan's host sync then serializes
        frames (each waits for the previous frame's full pipeline).
        2 = plan from two frames back: its computation finished long ago,
        so the sync returns immediately and consecutive frames PIPELINE
        through the dispatch queue. The window margin scales by the lag
        (staleness costs coverage, not correctness); self-healing takes
        `lag` frames instead of one.
    """

    t_a0_win: int = 40
    t_a0_wide: int = 0
    thickness_cells: float = 2.0
    motion_cells: float = 2.0
    hit_thresh: float = 0.995
    win_segments: int = 0
    win_k: int = 0
    group: int = 16
    plan_lag: int = 2
    round_samples: int = 8
    round_compact: int = 4
    shade_order: str = "ray"
    bg_color: float = 1.0


class SequenceRenderer:
    """Renders a pose sequence chunk-by-tile with previous-frame depth reuse.

    Usage:
        sr = SequenceRenderer(field, occupancy, mcfg, H, W, cfg)
        for pose in orbit:
            img, depth, stats = sr.render_pose(pose, intrinsics)
            # or sr.render(rays_o, rays_d) with ROW-MAJOR rays
        sr.reset()                                   # new sequence / teleport

    Compiles a fixed set of programs regardless of sequence length: the
    narrow windowed all-chunks scan, one wide group, one full group, the
    window plan, and (render_pose only) the tile-major ray generator.
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
        # pixel coords of the padded tile-major ray order (render_pose)
        self._pi = jnp.asarray((perm % W).astype(np.float32))
        self._pj = jnp.asarray((perm // W).astype(np.float32))

        cap = _phase_a_cap(mcfg)
        # reach margin: one ladder step for the near jitter, one for the
        # endpoint-or segment test
        self.w_cap = (cfg.t_a0_win - 2) * cap
        self.w_cap_wide = (cfg.t_a0_wide - 2) * cap if cfg.t_a0_wide else 0.0
        hc = mcfg.grid_size // mcfg.coarse_factor
        # staleness scales only the MOTION part of the margin: a lag-L plan
        # must cover L frames of depth drift; surface thickness is static
        cell = 2.0 * min(1.0, mcfg.bound) / hc
        self.margin = (cfg.thickness_cells
                       + cfg.motion_cells * max(1, cfg.plan_lag)) * cell

        win_cfg = dataclasses.replace(
            mcfg, t_a0_steps=cfg.t_a0_win,
            coarse_segments=(cfg.win_segments or mcfg.coarse_segments),
            samples_per_ray=(cfg.win_k or mcfg.samples_per_ray))
        wide_cfg = dataclasses.replace(mcfg, t_a0_steps=cfg.t_a0_wide) \
            if cfg.t_a0_wide else None

        from nerfnav_tpu.models.renderer import render_rays_grid_rounds

        def chunk_out3(mc, ro, rd, zw):
            out = render_rays_grid_rounds(
                field, occupancy, mc, ro, rd, bg_color=cfg.bg_color,
                round_samples=cfg.round_samples,
                round_compact=cfg.round_compact,
                shade_order=cfg.shade_order, z_window=zw)
            return out["image"], out["depth"], out["weights_sum"]

        @jax.jit
        def win_scan(ro_s, rd_s, zlo, zhi):
            """All m chunks in one dispatch; non-narrow slots carry an empty
            window (zlo == zhi == 0 -> every candidate masked, rounds all
            skip) so their cost is the short march only."""
            return jax.lax.map(
                lambda a: chunk_out3(win_cfg, a[0], a[1], (a[2], a[3])),
                (ro_s, rd_s, zlo, zhi))

        def group_step(mc, windowed):
            """One fused render-selected-chunks-and-merge program: gathers
            `group` chunks out of the frame's ray stack, renders them on
            ladder `mc`, and scatters the results into the DONATED frame
            buffers — one dispatch per group, no separate merge ops."""

            def step(img, dep, ws, ro_s, rd_s, ids, zlo_g, zhi_g):
                ro_g = jnp.take(ro_s, ids, axis=0)
                rd_g = jnp.take(rd_s, ids, axis=0)
                if windowed:
                    img_g, dep_g, ws_g = jax.lax.map(
                        lambda a: chunk_out3(mc, a[0], a[1], (a[2], a[3])),
                        (ro_g, rd_g, zlo_g, zhi_g))
                else:
                    img_g, dep_g, ws_g = jax.lax.map(
                        lambda a: chunk_out3(mc, a[0], a[1], None),
                        (ro_g, rd_g))
                # padded duplicate ids scatter identical values
                return (img.at[ids].set(img_g), dep.at[ids].set(dep_g),
                        ws.at[ids].set(ws_g))

            return jax.jit(step, donate_argnums=(0, 1, 2))

        self._full_step = group_step(mcfg, windowed=False)
        self._wide_step = group_step(wide_cfg, windowed=True) \
            if wide_cfg is not None else None

        w_cap, w_cap_wide = self.w_cap, self.w_cap_wide
        margin = self.margin
        ny, nx, m = self.ny, self.nx, self.m

        # static frame-border ring: these tiles can see geometry entering
        # from OFF-SCREEN, which no neighbor can vouch for
        border2 = np.zeros((ny, nx), bool)
        border2[0, :] = border2[-1, :] = True
        border2[:, 0] = border2[:, -1] = True
        border_j = jnp.asarray(border2)
        min_near = mcfg.min_near

        @jax.jit
        def plan(depth, wsum):
            """Per-chunk (z_lo, z_hi, bucket) from the previous frame's
            buffers (m, chunk); bucket 0 = narrow, 1 = wide, 2 = full.
            Tiles are chunk slots (tile_order is ty-major), so the 3x3
            dilation is a reshape to (ny, nx).

            Interior tiles window both sides. Frame-BORDER tiles clip the
            FAR side only (z_lo = 0 keeps the march from the cube entry):
            an off-screen object entering in front is then detected exactly
            (it gets marched), while geometry beyond the dilated termination
            depth was occluded for every ray of an all-hit tile — clipping
            it is the same self-healing one-frame risk class as interior
            disocclusion (a clipped reveal drops weights_sum, failing the
            hit test next frame)."""
            hit = jnp.all(wsum > cfg.hit_thresh, axis=1).reshape(ny, nx)
            dmin = jnp.min(depth, axis=1).reshape(ny, nx)
            dmax = jnp.max(depth, axis=1).reshape(ny, nx)

            def dil(x, op, fill):
                xp = jnp.pad(x, 1, constant_values=fill)
                rows = [xp[dy:dy + ny, dx:dx + nx]
                        for dy in range(3) for dx in range(3)]
                return op(jnp.stack(rows), axis=0)

            # interior policy: out-of-frame neighbors veto (pad False);
            # border policy: the tile vouches for itself (pad True) because
            # its near side stays fully marched
            hit9_i = dil(hit, jnp.min, False)
            hit9_b = dil(hit, jnp.min, True)
            zlo9 = dil(dmin, jnp.min, jnp.inf) - margin
            zhi9 = dil(dmax, jnp.max, -jnp.inf) + margin
            span = zhi9 - zlo9
            interior = ~border_j
            narrow_i = interior & hit9_i & (span <= w_cap)
            # border far-clip reach: the ladder must span cube entry ->
            # zhi9 for every ray; near >= min_near bounds it
            narrow_b = border_j & hit9_b & ((zhi9 - min_near) <= w_cap)
            narrow = narrow_i | narrow_b
            if w_cap_wide > 0.0:
                wide_i = (interior & hit9_i & ~narrow_i
                          & (span <= w_cap_wide))
                wide_b = (border_j & hit9_b & ~narrow_b
                          & ((zhi9 - min_near) <= w_cap_wide))
                wide = wide_i | wide_b
            else:
                wide_i = wide = jnp.zeros_like(narrow)
            bucket = jnp.where(narrow, 0, jnp.where(wide, 1, 2))
            both_side = narrow_i | wide_i   # border tiles keep zlo = 0
            zlo = jnp.where(both_side,
                            jnp.maximum(zlo9, 0.0), 0.0).reshape(m)
            zhi = jnp.where(narrow | wide, zhi9, 0.0).reshape(m)
            return zlo, zhi, bucket.reshape(m)

        self._win_fn, self._plan_fn = win_scan, plan
        self._ray_fn = None
        self._plans = []   # device plans, oldest first; plan_lag deep
        self._poses = []   # (pose, intrinsics) history matching the plans

        # border-tile centers (real-pixel clipped) + inward normals for the
        # leading-edge reveal gate (see _reveal_mask)
        ty, tx = np.meshgrid(np.arange(self.ny), np.arange(self.nx),
                             indexing="ij")
        cu = np.minimum(tx * tile + tile / 2.0, W - 1.0)
        cv = np.minimum(ty * tile + tile / 2.0, H - 1.0)
        self._tile_uv = np.stack([cu.reshape(-1), cv.reshape(-1)], -1)
        self._border_np = border2.reshape(-1)

    def reset(self):
        """Drop the depth history (scene edit, teleport, occupancy update)."""
        self._plans = []
        self._poses = []

    def _reveal_mask(self, pose, intr, zlo_np, zhi_np):
        """Border tiles on the LEADING edge of the camera motion — where
        off-screen content flows INTO the frame — must render on the exact
        full path: their windows come from content that has never seen the
        entering geometry (the far-clip trust argument only covers geometry
        occluded by CURRENT content). Trailing/tangential border tiles keep
        the far-clip window. Flow is measured by reprojecting each border
        tile's center (at its window mid-depth) from the lag-old pose into
        the current camera; flow pointing inward from that tile's frame
        edge marks it revealing."""
        if (len(self._poses) < max(1, self.cfg.plan_lag)
                or self._poses[-max(1, self.cfg.plan_lag)] is None):
            return self._border_np.copy()
        p0, i0 = self._poses[-max(1, self.cfg.plan_lag)]
        p0 = np.asarray(p0, np.float64)
        p1 = np.asarray(pose, np.float64)
        intr = np.asarray(intr, np.float64)
        fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
        b = self._border_np
        uv = self._tile_uv[b]
        zmid = np.maximum(0.5 * (zlo_np[b] + zhi_np[b]), 1e-3)
        # tiles whose window is empty (non-hit) go full anyway; any zmid ok
        d_cam = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
                          np.ones(len(uv))], -1)
        d_w = d_cam @ p0[:3, :3].T
        x_w = p0[:3, 3] + d_w * zmid[:, None]
        v1 = (x_w - p1[:3, 3]) @ p1[:3, :3]   # = R1^T (X - o1)
        z1 = np.maximum(v1[:, 2], 1e-6)
        u1 = fx * v1[:, 0] / z1 + cx
        v1p = fy * v1[:, 1] / z1 + cy
        flow = np.stack([u1 - uv[:, 0], v1p - uv[:, 1]], -1)
        # inward normals of the frame edges this tile touches
        tx = (np.arange(self.m) % self.nx)[b]
        ty = (np.arange(self.m) // self.nx)[b]
        reveal = np.zeros(len(uv), bool)
        eps = 1e-3
        reveal |= (tx == 0) & (flow[:, 0] > eps)            # left edge
        reveal |= (tx == self.nx - 1) & (flow[:, 0] < -eps)  # right edge
        reveal |= (ty == 0) & (flow[:, 1] > eps)            # top edge
        reveal |= (ty == self.ny - 1) & (flow[:, 1] < -eps)  # bottom edge
        out = np.zeros(self.m, bool)
        out[b] = reveal
        return out

    def render_pose(self, pose, intrinsics):
        """Render one frame of the sequence from a camera pose: rays are
        generated directly in padded tile-major order on device (one
        dispatch; no 640k-row host permutes)."""
        if self._ray_fn is None:
            from nerfnav_tpu.data.rays import rays_from_pixels

            pi, pj = self._pi, self._pj

            @jax.jit
            def ray_fn(pose, intr):
                r = rays_from_pixels(pose, intr, pi, pj)
                return (r["rays_o"].reshape(self.m, self.chunk, 3),
                        r["rays_d"].reshape(self.m, self.chunk, 3))

            self._ray_fn = ray_fn
        ro, rd = self._ray_fn(jnp.asarray(pose, jnp.float32),
                              jnp.asarray(intrinsics, jnp.float32))
        return self._render_stacked(ro, rd, pose=np.asarray(pose),
                                    intr=np.asarray(intrinsics))

    def render(self, rays_o, rays_d):
        """rays_o/rays_d: (H*W, 3) ROW-MAJOR. Returns (image (H, W, 3),
        depth (H, W), stats dict); device arrays. Frame 0 (or after reset)
        renders fully exact. Without the pose (render_pose), the leading-
        edge reveal gate cannot run, so EVERY border tile renders on the
        exact full path."""
        ro = jnp.take(rays_o, self._perm, axis=0).reshape(self.m, self.chunk, 3)
        rd = jnp.take(rays_d, self._perm, axis=0).reshape(self.m, self.chunk, 3)
        return self._render_stacked(ro, rd)

    def _render_stacked(self, ro, rd, pose=None, intr=None):
        g = self.cfg.group
        lag = max(1, self.cfg.plan_lag)

        if len(self._plans) < lag:
            bucket_np = np.full(self.m, 2)
            zlo = zhi = jnp.zeros((self.m,), jnp.float32)
        else:
            # lag-deep plan: its computation finished frames ago, so this
            # sync does not stall the dispatch pipeline (plan_lag >= 2)
            zlo, zhi, bucket = self._plans[-lag]
            bucket_np = np.asarray(bucket).copy()
            if pose is not None:
                reveal = self._reveal_mask(pose, intr, np.asarray(zlo),
                                           np.asarray(zhi))
            else:
                reveal = self._border_np
            bucket_np[reveal & (bucket_np != 2)] = 2

        if (bucket_np == 0).any():
            img, dep, ws = self._win_fn(ro, rd, zlo, zhi)
        else:
            img = jnp.zeros((self.m, self.chunk, 3), jnp.float32)
            dep = jnp.zeros((self.m, self.chunk), jnp.float32)
            ws = jnp.zeros((self.m, self.chunk), jnp.float32)

        for b, step in ((1, self._wide_step), (2, self._full_step)):
            idxs = np.nonzero(bucket_np == b)[0]
            for s in range(0, len(idxs), g):
                ids = idxs[s:s + g]
                ids_p = jnp.asarray(np.concatenate(
                    [ids, np.repeat(ids[:1], g - len(ids))]))
                img, dep, ws = step(img, dep, ws, ro, rd, ids_p,
                                    jnp.take(zlo, ids_p),
                                    jnp.take(zhi, ids_p))

        self._plans.append(self._plan_fn(dep, ws))
        self._poses.append(None if pose is None
                           else (pose.copy(), np.asarray(intr).copy()))
        if len(self._plans) > lag:
            self._plans.pop(0)
            self._poses.pop(0)
        out = jnp.take(img.reshape(-1, 3), self._inv, axis=0)
        out = out.reshape(self.Hp, self.Wp, 3)[: self.H, : self.W]
        dep_out = jnp.take(dep.reshape(-1), self._inv, axis=0)
        dep_out = dep_out.reshape(self.Hp, self.Wp)[: self.H, : self.W]
        stats = {"n_win": int((bucket_np == 0).sum()),
                 "n_wide": int((bucket_np == 1).sum()),
                 "n_full": int((bucket_np == 2).sum())}
        return out, dep_out, stats
