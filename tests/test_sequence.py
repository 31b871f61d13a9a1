"""Frame-coherent sequence renderer (models/sequence.py): previous-frame
depth windows must reproduce the exact full-ladder render on smooth orbits
(the reference's test->mp4 / GUI workload, utils.py:588-636) while actually
engaging the short-ladder path, and must fall back to the exact path
wherever the window trust rule fails."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.data.rays import get_all_rays, tile_order
from nerfnav_tpu.models import NetworkConfig, init_network, make_field
from nerfnav_tpu.models.renderer import render_rays_grid_rounds
from nerfnav_tpu.models.sequence import SequenceConfig, SequenceRenderer
from nerfnav_tpu.ops.marching import MarchConfig
from nerfnav_tpu.ops.morton import pack_blocks, packbits

H = W = 128
TILE = 32
INTR = np.asarray([160.0, 160.0, W / 2, H / 2], np.float32)


def shell_occupancy(hg=32, cf=4, with_wall=True):
    ii = np.arange(hg**3)
    c = (np.stack([ii // (hg * hg), (ii // hg) % hg, ii % hg], -1) + 0.5) \
        / hg * 2 - 1
    r = np.linalg.norm(c, axis=-1)
    occ = (r > 0.35) & (r < 0.55)
    if with_wall:
        occ |= np.abs(c[:, 2] - 0.8) < 0.1   # wall behind the shell
    occ = occ[None]
    hc = hg // cf
    occ_c = occ.reshape(1, hc, cf, hc, cf, hc, cf).max(axis=(2, 4, 6))
    return {
        "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
        "bitfield_coarse": packbits(
            jnp.asarray(occ_c.reshape(1, -1).astype(np.float32))),
        "blocks": pack_blocks(jnp.asarray(occ), hg),
        "blocks_coarse": pack_blocks(
            jnp.asarray(occ_c.reshape(1, -1)), hc, block=8),
    }


def look_at(eye, target=(0.0, 0.0, 0.0)):
    """Camera-to-world pose with +z looking at target (bench convention)."""
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, up2, fwd, eye
    return jnp.asarray(pose)


def orbit_pose(deg, radius=1.6):
    th = np.radians(deg)
    return look_at([radius * np.sin(th), 0.0, -radius * np.cos(th)])


@pytest.fixture(scope="module")
def setup():
    cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=12,
                        grid_max_resolution=64, grid_layout="cell",
                        grid_level_dim=4, density_scale=200.0)
    params = init_network(jax.random.PRNGKey(0), cfg)
    field = make_field(params, cfg)
    occupancy = shell_occupancy()
    mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=256,
                       samples_per_ray=16, min_near=0.05,
                       coarse_segments=8)
    return field, occupancy, mcfg


_full_chunk_cache = {}


def full_render(field, occupancy, mcfg, rays_o, rays_d, chunk=TILE * TILE,
                **kw):
    """Exact-path control render. JITTED like the product path: an eager
    control is NOT comparable — XLA fusion (FMA) flips floor() cell coords
    for samples near representable boundaries and the conservative
    anchor-match plus budget compaction amplify each flip across the ray
    (same caveat as tests/test_scan_render.py)."""
    key = (id(field), id(occupancy), mcfg, tuple(sorted(kw.items())))
    fn = _full_chunk_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda a, b: render_rays_grid_rounds(
            field, occupancy, mcfg, a, b, **kw)["image"])
        _full_chunk_cache[key] = fn
    perm, inv = tile_order(H, W, TILE)
    ro = jnp.take(rays_o, jnp.asarray(perm), axis=0)
    rd = jnp.take(rays_d, jnp.asarray(perm), axis=0)
    outs = [fn(ro[i:i + chunk], rd[i:i + chunk])
            for i in range(0, H * W, chunk)]
    img = jnp.concatenate(outs)[jnp.asarray(inv)]
    return np.asarray(img.reshape(H, W, 3))


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


class TestSequence:
    def test_frame0_exact_and_orbit_parity(self, setup):
        field, occupancy, mcfg = setup
        sr = SequenceRenderer(field, occupancy, mcfg, H, W,
                              SequenceConfig(round_samples=4), tile=TILE)
        engaged = 0
        for i, deg in enumerate([0.0, 2.0, 4.0, 6.0, 8.0]):
            rays = get_all_rays(orbit_pose(deg), jnp.asarray(INTR), H, W)
            img, _d, stats = sr.render(rays["rays_o"], rays["rays_d"])
            ref = full_render(field, occupancy, mcfg, rays["rays_o"],
                              rays["rays_d"], round_samples=4)
            if i == 0:
                # first frames (plan_lag deep) render fully exact
                assert stats["n_full"] == sr.m
                np.testing.assert_allclose(np.asarray(img), ref, atol=1e-5)
            else:
                engaged += stats["n_win"] + stats["n_wide"]
                # Two ladder pitches legitimately disagree on corner-graze
                # silhouette slivers (the coarse endpoint test is pointwise
                # at the ladder pitch, exactly like the reference's
                # march-at-dt, raymarching.cu:372-404) — and on THIS toy
                # framing some rays miss everything, making grazes visible.
                # Gate: high PSNR overall AND the diff confined to a
                # sliver-sized pixel fraction (window bugs corrupt whole
                # tiles: 1 tile = 6.25% of this frame).
                d = np.abs(np.asarray(img) - ref).max(axis=-1)
                frac_off = float((d > 0.1).mean())
                p = psnr(np.asarray(img), ref)
                assert p > 27.0, (i, p, stats)
                assert frac_off < 0.01, (i, frac_off, stats)
        # the short-ladder path actually ran on the later frames
        assert engaged > 0

    def test_reset_forces_full_frame(self, setup):
        field, occupancy, mcfg = setup
        sr = SequenceRenderer(field, occupancy, mcfg, H, W,
                              SequenceConfig(round_samples=4), tile=TILE)
        rays = get_all_rays(orbit_pose(0.0), jnp.asarray(INTR), H, W)
        for _ in range(3):   # plan_lag-deep history before windows engage
            _, _d, stats = sr.render(rays["rays_o"], rays["rays_d"])
        assert stats["n_win"] + stats["n_wide"] > 0
        sr.reset()
        _, _d, stats = sr.render(rays["rays_o"], rays["rays_d"])
        assert stats["n_full"] == sr.m

    def test_background_keeps_exact_path(self, setup):
        """A small ball: the frame border sees pure background; those tiles
        (hit test fails) and their neighbors must keep the full-ladder path,
        and the whole frame must stay at parity with the exact render.

        The ball is deliberately OFF-center and the orbit starts off-axis:
        axis-aligned synthetic scenes park march samples exactly on cell
        boundaries, where two differently-fused XLA programs legitimately
        disagree (same caveat as tests/test_scan_render.py); the PSNR gate
        tolerates a handful of such silhouette flips, not window errors."""
        field, _, mcfg = setup
        hg = 32
        ii = np.arange(hg**3)
        c = (np.stack([ii // (hg * hg), (ii // hg) % hg, ii % hg], -1) + 0.5)\
            / hg * 2 - 1
        ctr = np.array([0.123, -0.077, 0.051], np.float32)
        occ = (np.linalg.norm(c - ctr, axis=-1) < 0.3)[None]
        hc = hg // 4
        occ_c = occ.reshape(1, hc, 4, hc, 4, hc, 4).max(axis=(2, 4, 6))
        occupancy = {
            "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
            "bitfield_coarse": packbits(
                jnp.asarray(occ_c.reshape(1, -1).astype(np.float32))),
            "blocks": pack_blocks(jnp.asarray(occ), hg),
            "blocks_coarse": pack_blocks(
                jnp.asarray(occ_c.reshape(1, -1)), hc, block=8),
        }
        sr = SequenceRenderer(field, occupancy, mcfg, H, W,
                              SequenceConfig(round_samples=4), tile=TILE)
        for deg in [3.7, 6.2, 8.7]:
            rays = get_all_rays(orbit_pose(deg, radius=1.57),
                                jnp.asarray(INTR), H, W)
            img, _d, stats = sr.render(rays["rays_o"], rays["rays_d"])
            ref = full_render(field, occupancy, mcfg, rays["rays_o"],
                              rays["rays_d"], round_samples=4)
            assert psnr(np.asarray(img), ref) > 35.0
        # background/silhouette tiles stayed on the exact path
        assert stats["n_full"] > 0

    def test_window_chain_self_heals(self, setup):
        """Windows chain frame-to-frame (depth from a WINDOWED frame feeds
        the next plan); a long orbit must not accumulate error."""
        field, occupancy, mcfg = setup
        sr = SequenceRenderer(field, occupancy, mcfg, H, W,
                              SequenceConfig(round_samples=4), tile=TILE)
        last = None
        for deg in np.arange(0.0, 20.0, 2.5):
            rays = get_all_rays(orbit_pose(deg), jnp.asarray(INTR), H, W)
            img, _d, stats = sr.render(rays["rays_o"], rays["rays_d"])
            last = (rays, img, stats)
        rays, img, stats = last
        ref = full_render(field, occupancy, mcfg, rays["rays_o"],
                          rays["rays_d"], round_samples=4)
        assert psnr(np.asarray(img), ref) > 40.0, stats

    def test_reveal_gate_leading_border(self, setup):
        """render_pose on a continuous orbit: the LEADING frame edge (where
        off-screen content flows in) must render on the exact full path
        every frame, and the whole frame must stay near parity even while
        the orbit keeps revealing."""
        field, occupancy, mcfg = setup
        sr = SequenceRenderer(field, occupancy, mcfg, H, W,
                              SequenceConfig(round_samples=4), tile=TILE)
        worst = 99.0
        for i, deg in enumerate(np.arange(0.0, 12.0, 2.0)):
            pose = orbit_pose(deg)
            img, _d, stats = sr.render_pose(np.asarray(pose), INTR)
            rays = get_all_rays(pose, jnp.asarray(INTR), H, W)
            ref = full_render(field, occupancy, mcfg, rays["rays_o"],
                              rays["rays_d"], round_samples=4)
            if i >= 2:
                worst = min(worst, psnr(np.asarray(img), ref))
                d = np.abs(np.asarray(img) - ref).max(axis=-1)
                assert float((d > 0.1).mean()) < 0.01, (i, stats)
        assert worst > 30.0, worst
        # the gate actually fired: the last frame had full tiles (leading
        # border) AND windowed tiles
        assert stats["n_full"] > 0
        assert stats["n_win"] + stats["n_wide"] > 0

    def test_validation(self, setup):
        field, occupancy, mcfg = setup
        with pytest.raises(ValueError, match="normalized"):
            SequenceRenderer(field, occupancy,
                             dataclasses.replace(mcfg,
                                                 coarse_normalized=False),
                             H, W, tile=TILE)

    def test_partial_edge_tiles(self, setup):
        """Non-multiple frame sizes (800 = 12.5 x 64 in the flagship bench)
        pad the tile grid with clamp-replicated edge rays; output parity
        against the exact render at the real size."""
        field, occupancy, mcfg = setup
        hh, ww = H - 24, W - 8   # 104 x 120, neither a multiple of 32
        intr = jnp.asarray([160.0, 160.0, ww / 2, hh / 2], jnp.float32)
        sr = SequenceRenderer(field, occupancy, mcfg, hh, ww,
                              SequenceConfig(round_samples=4), tile=TILE)
        perm, inv = tile_order(hh, ww, TILE)
        fn = jax.jit(lambda a, b: render_rays_grid_rounds(
            field, occupancy, mcfg, a, b, round_samples=4)["image"])
        for deg in [0.0, 2.0]:
            rays = get_all_rays(orbit_pose(deg), intr, hh, ww)
            img, _d, stats = sr.render(rays["rays_o"], rays["rays_d"])
            assert img.shape == (hh, ww, 3)
            ro = jnp.take(rays["rays_o"], jnp.asarray(perm), axis=0)
            rd = jnp.take(rays["rays_d"], jnp.asarray(perm), axis=0)
            n = hh * ww
            pad = (-n) % (TILE * TILE)
            ro = jnp.pad(ro, ((0, pad), (0, 0)))
            rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            ref = jnp.concatenate(
                [fn(ro[i:i + TILE * TILE], rd[i:i + TILE * TILE])
                 for i in range(0, n + pad, TILE * TILE)])[:n]
            ref = np.asarray(ref[jnp.asarray(inv)].reshape(hh, ww, 3))
            assert psnr(np.asarray(img), ref) > 35.0, (deg, stats)
