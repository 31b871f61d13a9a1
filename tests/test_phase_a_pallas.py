"""The Pallas phase-A coords kernel is bit-exact vs the XLA path.

Runs in interpret mode on the CPU test mesh; the chip A/B lives in
bench.py --phase_a pallas.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.ops import marching as M
from nerfnav_tpu.ops.morton import block_size_of, pack_blocks
from nerfnav_tpu.ops.phase_a_pallas import phase_a_coords, unpack_codes


def _rand_rays(n, key, bound):
    ko, kd = jax.random.split(key)
    o = jax.random.uniform(ko, (n, 3), minval=-1.8, maxval=1.8) * bound / 2
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("bound", [1.0, 2.0])
def test_codes_match_block_coords(bound):
    cfg = M.MarchConfig(bound=bound, grid_size=64, samples_per_ray=16,
                        min_near=0.05)
    hc = cfg.grid_size // cfg.coarse_factor
    bc = 8
    n = 37
    o, d = _rand_rays(n, jax.random.PRNGKey(0), bound)
    near, far = M.near_far_aabb(o, d, cfg.bound, cfg.min_near)
    g_a = 13
    z_a, dt_a, t_a = M._phase_a_ladder(near, far, cfg, round_to=g_a)

    pos_a = o[:, None, :] + d[:, None, :] * z_a[..., None]
    flat_ref, local_ref = M._block_coords(pos_a, dt_a, hc, cfg, block=bc)
    zin_ref = z_a < far[:, None]

    codes = phase_a_coords(o, d, near, dt_a, far, t_a=t_a, hc=hc, bc=bc,
                           cascades=cfg.cascades, bound=cfg.bound,
                           interpret=True)
    flat, local, zin = unpack_codes(codes)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(flat_ref))
    np.testing.assert_array_equal(np.asarray(local), np.asarray(local_ref))
    np.testing.assert_array_equal(np.asarray(zin), np.asarray(zin_ref))


def test_march_rays_block_pallas_backend_matches_xla():
    cfg = M.MarchConfig(bound=1.0, grid_size=64, samples_per_ray=16,
                        min_near=0.05, coarse_segments=8, coarse_anchors=2)
    cfg_p = dataclasses.replace(cfg, phase_a_backend="pallas")
    hc = cfg.grid_size // cfg.coarse_factor

    rng = np.random.default_rng(3)
    occ = jnp.asarray(
        (rng.random((cfg.cascades, cfg.grid_size**3)) < 0.04).astype(np.float32))
    occ_c = occ.reshape(cfg.cascades, hc, 4, hc, 4, hc, 4).max(
        axis=(2, 4, 6)).reshape(cfg.cascades, -1)
    blocks = pack_blocks(occ, cfg.grid_size)
    blocks_c = pack_blocks(occ_c, hc, block=8)
    assert block_size_of(blocks_c) == 8

    o, d = _rand_rays(65, jax.random.PRNGKey(5), cfg.bound)
    ref = M.march_rays_block(o, d, blocks, blocks_c, cfg)
    out = M.march_rays_block(o, d, blocks, blocks_c, cfg_p)
    for k in ("z", "dt"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))
