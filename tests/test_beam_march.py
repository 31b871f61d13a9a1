"""Beam-shared phase A (MarchConfig.beam): conservatism + parity.

The beam marcher shares one coarse march per group of consecutive rays
against a 1-cell-dilated coarse table (chip profile round 4: phase A is
108 of the 262 ms rounds frame). Correctness contract: a dilated beam test
is a SUPERSET of each member's own coarse test whenever in-beam spread
stays under one coarse cell — false positives only (phase B's exact fine
test rejects them), never a dropped segment. Reference analogue: none —
the CUDA marcher walks every ray independently (raymarching.cu:707-825).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.ops.marching import MarchConfig, march


def _sphere_occupancy(cfg, bound=1.0, radius=0.5, coarse_block=4):
    from nerfnav_tpu.ops.morton import pack_blocks, packbits as pb

    H = cfg.grid_size
    idx = np.arange(H**3)
    c = (np.stack([idx // (H * H), (idx // H) % H, idx % H], -1) + 0.5) / H * 2 - 1
    occs = []
    for cas in range(cfg.cascades):
        cb = min(2.0**cas, bound)
        occs.append(np.linalg.norm(c * cb, axis=-1) < radius * cb)
    occ = jnp.asarray(np.stack(occs))
    f = cfg.coarse_factor
    hc = H // f
    occ_c = (np.stack(occs).reshape(-1, hc, f, hc, f, hc, f)
             .max(axis=(2, 4, 6)).reshape(-1, hc**3))
    return {
        "bitfield": pb(occ.astype(jnp.float32)),
        "blocks": pack_blocks(occ, H),
        "blocks_coarse": pack_blocks(jnp.asarray(occ_c), hc,
                                     block=coarse_block),
    }


def _pixel_rows(n, rows=2, z0=-1.5, fov_scale=0.25):
    """n rays arranged as `rows` adjacent pixel rows (row-major like a tile
    chunk): consecutive rays are horizontally adjacent — the layout the
    beam contract requires."""
    per = n // rows
    o = np.tile(np.array([0.0, 0.0, z0], np.float32), (n, 1))
    xs = (np.arange(per) / per - 0.5) * fov_scale
    ys = (np.arange(rows)[:, None] / max(per, 1) - 0.0) * fov_scale
    d = np.stack(
        [np.broadcast_to(xs, (rows, per)),
         np.broadcast_to(ys, (rows, per)),
         np.ones((rows, per))], axis=-1).reshape(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture
def cfg():
    # ample budgets: no stride thinning, so sample coverage is exact
    return MarchConfig(bound=1.0, grid_size=32, max_steps=256,
                       samples_per_ray=64, coarse_segments=24, min_near=0.05)


class TestUnpackBlocks:
    def test_roundtrip(self):
        from nerfnav_tpu.ops.morton import (
            pack_blocks, unpack_blocks,
        )

        rng = np.random.default_rng(0)
        for h, b in [(16, 4), (32, 8)]:
            occ = jnp.asarray(rng.uniform(size=(2, h**3)) < 0.1)
            rows = pack_blocks(occ, h, block=b)
            back = unpack_blocks(rows, h)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(occ))


class TestBeamMarch:
    def _coverage(self, m):
        """Per-ray occupied z-interval [min kept z, max kept z]."""
        z = np.asarray(m["z"])
        v = np.asarray(m["valid"])
        lo = np.where(v, z, np.inf).min(axis=1)
        hi = np.where(v, z, -np.inf).max(axis=1)
        return lo, hi

    def test_beam_covers_member_surface(self, cfg):
        """Every ray that hits the sphere under beam=1 must still bracket
        the same surface interval under beam=4 (dilation + broadcast can
        only widen coverage, never drop it)."""
        occ = _sphere_occupancy(cfg)
        o, d = _pixel_rows(64, rows=2)
        m1 = march(o, d, occ, cfg)
        m4 = march(o, d, occ, dataclasses.replace(cfg, beam=4))
        lo1, hi1 = self._coverage(m1)
        lo4, hi4 = self._coverage(m4)
        hit = np.asarray(m1["valid"]).any(axis=1)
        assert hit.sum() > 8
        # beam coverage brackets the member coverage (one fine cell slack
        # for lattice-phase shift between beam-near and member-near anchors)
        cell = 2.0 * cfg.bound / cfg.grid_size
        assert (lo4[hit] <= lo1[hit] + cell + 1e-6).all(), (lo4[hit] - lo1[hit]).max()
        assert (hi4[hit] >= hi1[hit] - cell - 1e-6).all()

    def test_beam_samples_inside_dilated_sphere(self, cfg):
        """Phase B stays exact: beam samples still lie in the sphere's
        z-extent (cell-padded) — the dilation must not leak samples into
        far empty space."""
        occ = _sphere_occupancy(cfg)
        o, d = _pixel_rows(64, rows=2)
        m4 = march(o, d, occ, dataclasses.replace(cfg, beam=4))
        z = np.asarray(m4["z"])
        v = np.asarray(m4["valid"])
        # sphere radius 0.5*0.55... -> z extent around 1.5 +- ~0.45
        zs = z[v]
        assert ((zs > 0.9) & (zs < 2.1)).all()

    def test_indivisible_n_falls_back(self, cfg):
        """N % beam != 0 silently disables beaming (identical output)."""
        occ = _sphere_occupancy(cfg)
        o, d = _pixel_rows(66, rows=2)
        m1 = march(o, d, occ, cfg)
        mb = march(o, d, occ, dataclasses.replace(cfg, beam=4))
        np.testing.assert_array_equal(np.asarray(m1["valid"]),
                                      np.asarray(mb["valid"]))
        np.testing.assert_allclose(np.asarray(m1["z"]), np.asarray(mb["z"]))

    @pytest.mark.parametrize("beam", [4, 8])
    def test_render_parity(self, cfg, beam):
        """End-to-end render: beam matches beam=1 tightly on the analytic
        textured sphere (ample budgets; the extra dilated candidates shade
        ~zero density off-surface). Residual diff is silhouette lattice
        phase — samples anchored at beam-near instead of member-near shift
        by a sub-dt offset (CPU: 42.3 dB at beam=4, 40.6 at beam=8)."""
        from nerfnav_tpu.data.synthetic import textured_sphere_field
        from nerfnav_tpu.models import render_rays_grid

        field = textured_sphere_field(radius=0.35)
        c = dataclasses.replace(cfg, samples_per_ray=48, coarse_segments=24)
        occ = _sphere_occupancy(c, radius=0.45)
        o, d = _pixel_rows(256, rows=4, fov_scale=0.5)
        img1 = render_rays_grid(field, occ, c, o, d, bg_color=1.0)["image"]
        img4 = render_rays_grid(field, occ, dataclasses.replace(c, beam=beam),
                                o, d, bg_color=1.0)["image"]
        err = float(jnp.abs(img1 - img4).max())
        assert err < 8e-2, err
        mse = float(jnp.mean((img1 - img4) ** 2))
        psnr = -10.0 * np.log10(mse + 1e-12)
        assert psnr > 38.0, psnr


class TestBeamProxyConservative:
    """proxy_terminate under beam>1 (round-4 advisor finding): the proxy
    transmittance runs along the BEAM ray, so the table it reads must be
    min-pooled over the same 1-cell neighborhood as the occupancy dilation
    — otherwise a member whose path crosses adjacent less-dense cells gets
    its real far segments terminated."""

    def _state(self, cfg, wall_y_min, sigma=500.0, wall_z=(3, 5)):
        """All-occupied bitfield; density_coarse_min carries a coarse-z wall
        slab of `sigma` only where coarse y >= wall_y_min."""
        from nerfnav_tpu.ops.morton import pack_blocks, packbits as pb

        H, f = cfg.grid_size, cfg.coarse_factor
        hc = H // f
        occ = jnp.ones((cfg.cascades, H**3), bool)
        occ_c = jnp.ones((cfg.cascades, hc**3), bool)
        dmin = np.zeros((cfg.cascades, hc, hc, hc), np.float32)
        z0, z1 = wall_z
        dmin[0, :, wall_y_min:, z0:z1] = sigma
        return {
            "bitfield": pb(occ.astype(jnp.float32)),
            "bitfield_coarse": pb(occ_c.astype(jnp.float32)),
            "blocks": pack_blocks(occ, H),
            "blocks_coarse": pack_blocks(occ_c, hc, block=4),
            "density_coarse_min": jnp.asarray(dmin.reshape(cfg.cascades, -1)),
        }

    def _beam_rays(self):
        # common origin, directions straddling the coarse-y boundary at 0:
        # member 0 crosses the wall plane at y=-0.125 (coarse row 3, below
        # wall_y_min=4), members 1-3 and the beam MEAN ray at y in row 4
        # (dense). In-beam spread at the wall ~0.19 < one coarse cell (0.25).
        o = jnp.tile(jnp.array([[0.0, 0.0, -1.5]], jnp.float32), (4, 1))
        a = np.array([-1.0 / 12, 1.0 / 36, 1.0 / 12, 5.0 / 36], np.float32)
        d = np.stack([np.zeros(4, np.float32), a, np.ones(4, np.float32)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return o, jnp.asarray(d)

    def test_member_in_less_dense_row_keeps_far_samples(self, cfg):
        cfgb = dataclasses.replace(cfg, beam=4, proxy_terminate=True)
        occ = self._state(cfgb, wall_y_min=4)
        o, d = self._beam_rays()
        m_on = march(o, d, occ, cfgb)
        m_off = march(o, d, occ, dataclasses.replace(cfgb,
                                                     proxy_terminate=False))
        # the min-pooled table sees the empty y-row adjacent to every wall
        # cell, so the proxy is a NO-OP here: identical valid masks, and
        # member 0 keeps samples beyond the wall (z world > 0.3)
        np.testing.assert_array_equal(np.asarray(m_on["valid"]),
                                      np.asarray(m_off["valid"]))
        z0 = np.asarray(m_on["z"][0])[np.asarray(m_on["valid"][0])]
        zmax = -1.5 + z0.max()  # o_z + t (d ~ +z unit)
        assert zmax > 0.3, zmax

    def test_proxy_still_terminates_thick_walls_under_beam(self, cfg):
        # wall spanning every y and 4 coarse z-rows: min-pool leaves its
        # 2-row core dense, so beam proxy termination still fires
        cfgb = dataclasses.replace(cfg, beam=4, proxy_terminate=True)
        occ = self._state(cfgb, wall_y_min=0, wall_z=(2, 6))
        o, d = self._beam_rays()
        m_on = march(o, d, occ, cfgb)
        m_off = march(o, d, occ, dataclasses.replace(cfgb,
                                                     proxy_terminate=False))
        n_on = int(np.asarray(m_on["valid"]).sum())
        n_off = int(np.asarray(m_off["valid"]).sum())
        assert n_on < n_off, (n_on, n_off)
        # and the survivors never extend past the wall core exit (z ~ 0.5)
        z = np.asarray(m_on["z"])[np.asarray(m_on["valid"])]
        assert (-1.5 + z.max()) < 0.55


class TestBeamContractGuard:
    def test_violation_metric(self, cfg):
        """beam_contract_violation: tile-ordered pixel rows at a long focal
        pass; scrambled ray order fails loudly (> 1 coarse cell)."""
        import dataclasses

        from nerfnav_tpu.ops.marching import beam_contract_violation

        cfgb = dataclasses.replace(cfg, beam=8, grid_size=128)
        o, d = _pixel_rows(256, rows=2, fov_scale=0.02)  # ~f>1000 pixels
        v_ok = beam_contract_violation(np.asarray(d), cfgb)
        assert v_ok < 1.0, v_ok
        rng = np.random.default_rng(0)
        # a frame-scale FOV (0.5 rad ~ an 800^2 f800 frame), scrambled:
        # beams now mix rays from across the frame
        _, d_wide = _pixel_rows(256, rows=2, fov_scale=0.5)
        d_scr = np.asarray(d_wide)[rng.permutation(256)]
        v_bad = beam_contract_violation(d_scr, cfgb)
        assert v_bad > 1.0, v_bad
        # beam 1: always fine
        assert beam_contract_violation(d_scr,
                                       dataclasses.replace(cfgb, beam=1)) == 0

    def test_render_full_refuses_violating_beam(self, tmp_path):
        """render_full with an explicit wide-FOV eval_beam drops to
        unbeamed (warning) instead of silently losing geometry."""
        import dataclasses

        from nerfnav_tpu.models import NetworkConfig, RenderConfig
        from nerfnav_tpu.models.occupancy import OccupancyConfig
        from nerfnav_tpu.training import Trainer, TrainerOptions

        ncfg = NetworkConfig(bound=1.0, grid_levels=2,
                             grid_log2_hashmap_size=10,
                             grid_max_resolution=32, grid_layout="cell",
                             grid_level_dim=4)
        rcfg = RenderConfig(num_steps=8, upsample_steps=0, min_near=0.05,
                            max_ray_batch=256)
        opt = TrainerOptions(name="beamguard", workspace=str(tmp_path),
                             use_checkpoint="scratch", eval_beam=8)
        mcfg = MarchConfig(bound=1.0, grid_size=16, max_steps=32,
                           samples_per_ray=8, min_near=0.05)
        tr = Trainer(ncfg, rcfg, opt,
                     occupancy_cfg=OccupancyConfig(bound=1.0, grid_size=16,
                                                   update_chunk=512),
                     march_cfg=mcfg)
        tr.state = tr._init_state(1)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -1.5
        # 16x16 at focal 4: huge per-pixel angle -> spread >> 1 coarse cell
        intr = np.asarray([4.0, 4.0, 8.0, 8.0], np.float32)
        img, _ = tr.render_full(tr.state.params, pose, intr, 16, 16)
        assert np.isfinite(np.asarray(img)).all()
        (key,) = [k for k in tr._beam_guard_cache]
        assert tr._beam_guard_cache[key] > 1.0
        # and the beamed chunk program was never built
        assert all(b in (0, None) or b <= 1
                   for (_t, b) in tr._render_scan_fns.keys())


def test_precomputed_dilated_table_parity(cfg):
    """march with occupancy["blocks_coarse_dilated"] precomputed (the
    once-per-occupancy-version product path) is bitwise identical to the
    in-graph dilation fallback."""
    import dataclasses

    from nerfnav_tpu.ops.marching import dilate_blocks_coarse
    from nerfnav_tpu.ops.morton import block_size_of

    cfgb = dataclasses.replace(cfg, beam=4)
    occ = _sphere_occupancy(cfgb)
    o, d = _pixel_rows(64, rows=2)
    m_in = march(o, d, occ, cfgb)
    hc = cfgb.grid_size // cfgb.coarse_factor
    occ2 = dict(occ)
    occ2["blocks_coarse_dilated"] = dilate_blocks_coarse(
        occ["blocks_coarse"], hc, block_size_of(occ["blocks_coarse"]))
    m_pre = march(o, d, occ2, cfgb)
    for k in ("z", "dt", "valid"):
        np.testing.assert_array_equal(np.asarray(m_in[k]),
                                      np.asarray(m_pre[k]))


class TestFramePhaseASplit:
    """march(phase_a=...) — the round-5 frame-level phase-A split: one
    frame-wide phase A (stop_after hook) + per-chunk phase B must be
    bitwise identical to the fused per-chunk march."""

    @pytest.mark.parametrize("beam", [1, 4])
    def test_split_parity(self, cfg, beam):
        cfgb = dataclasses.replace(cfg, beam=beam)
        occ = _sphere_occupancy(cfgb)
        o, d = _pixel_rows(128, rows=2)
        m_ref = march(o, d, occ, cfgb)
        ma = march(o, d, occ, cfgb, stop_after="phase_a")
        # chunked consumption: two 64-ray chunks with sliced buffers
        outs = []
        for i in range(0, 128, 64):
            pa = {k: ma[k][i:i + 64] for k in ("z", "dt", "valid")}
            outs.append(march(o[i:i + 64], d[i:i + 64], occ, cfgb,
                              phase_a=pa))
        for k in ("z", "dt", "valid"):
            got = np.concatenate([np.asarray(m[k]) for m in outs])
            np.testing.assert_array_equal(got, np.asarray(m_ref[k]), err_msg=k)

    def test_gamma_rejected(self, cfg):
        cfgg = dataclasses.replace(cfg, dt_gamma=0.01)
        occ = _sphere_occupancy(cfgg)
        o, d = _pixel_rows(64, rows=2)
        ma = {"z": jnp.zeros((64, cfg.coarse_segments)),
              "dt": jnp.zeros((64, cfg.coarse_segments)),
              "valid": jnp.zeros((64, cfg.coarse_segments), bool)}
        with pytest.raises(ValueError):
            march(o, d, occ, cfgg, phase_a=ma)
