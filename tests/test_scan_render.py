"""Whole-frame scan dispatch: lax.map over stacked chunks must render the
same image as the host-level per-chunk loop (bench.py --scan A/B mode).

The map body is the identical render_rays_grid_rounds trace, so agreement is
expected to machine precision; tolerance covers fusion-order differences
between the standalone jit and the loop-body compilation context."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.data.rays import get_all_rays, tile_order
from nerfnav_tpu.data.synthetic import textured_sphere_field
from nerfnav_tpu.models import render_rays_grid_rounds
from nerfnav_tpu.ops.marching import MarchConfig
from nerfnav_tpu.ops.morton import pack_blocks, packbits

H = W = 128
TILE = 16
CHUNK = TILE * TILE


@pytest.fixture(scope="module")
def scene():
    field = textured_sphere_field(radius=0.35)
    mcfg = MarchConfig(bound=1.0, grid_size=64, max_steps=512,
                       samples_per_ray=32, min_near=0.05,
                       coarse_segments=12, coarse_anchors=2)
    Hg = mcfg.grid_size
    ii = np.arange(Hg**3)
    c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) \
        / Hg * 2 - 1
    r = np.linalg.norm(c, axis=-1)
    occ = ((r > 0.30) & (r < 0.45))[None]
    f = mcfg.coarse_factor
    hc = Hg // f
    occ_c = occ.reshape(1, hc, f, hc, f, hc, f).max(axis=(2, 4, 6))
    occupancy = {
        "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
        "bitfield_coarse": packbits(
            jnp.asarray(occ_c.reshape(1, -1).astype(np.float32))),
        "blocks": pack_blocks(jnp.asarray(occ), Hg),
        "blocks_coarse": pack_blocks(
            jnp.asarray(occ_c.reshape(1, -1)), hc,
            block=8 if hc % 8 == 0 else 4),
    }
    intr = jnp.asarray([90.0, 90.0, W / 2, H / 2])
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -1.6]))
    rays = get_all_rays(pose, intr, H, W)
    perm, inv = tile_order(H, W, TILE)
    ro = jnp.asarray(np.asarray(rays["rays_o"])[perm])
    rd = jnp.asarray(np.asarray(rays["rays_d"])[perm])
    return field, mcfg, occupancy, rays, ro, rd, perm



def test_scan_matches_per_chunk_loop(scene):  # noqa: F811
    field, mcfg, occupancy, rays, ro, rd, perm = scene
    n = H * W
    assert n % CHUNK == 0

    @jax.jit
    def render_chunk(a, b):
        return render_rays_grid_rounds(
            field, occupancy, mcfg, a, b, bg_color=1.0,
            round_samples=8, round_compact=4,
        )["image"]

    loop = jnp.concatenate([
        render_chunk(ro[i: i + CHUNK], rd[i: i + CHUNK])
        for i in range(0, n, CHUNK)
    ])

    ro_s = ro.reshape(-1, CHUNK, 3)
    rd_s = rd.reshape(-1, CHUNK, 3)

    @jax.jit
    def render_frame_scan(ro_s, rd_s):
        return jax.lax.map(
            lambda ab: render_chunk(ab[0], ab[1]), (ro_s, rd_s))

    scanned = render_frame_scan(ro_s, rd_s).reshape(n, 3)

    np.testing.assert_allclose(
        np.asarray(scanned), np.asarray(loop), atol=1e-5)


def test_trainer_render_full_eval_scan(tmp_path):
    """Trainer.render_full with eval_scan renders the same chunks through
    one lax.map program — images must match the per-chunk loop tightly."""
    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.data.synthetic import make_synthetic_scene
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    d = str(tmp_path / "scene")
    make_synthetic_scene(d, n_train=4, n_val=1, H=64, W=64, num_steps=48)
    ds = NeRFDataset(DatasetOptions(path=d, scale=1.0), "train")
    cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=12,
                        grid_max_resolution=64)
    rcfg = RenderConfig(num_steps=32, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1024)

    def mk(scan):
        opt = TrainerOptions(name="scan", workspace=str(tmp_path / "ws"),
                             num_rays=256, use_checkpoint="scratch",
                             bg_train="white", eval_scan=scan)
        return Trainer(cfg, rcfg, opt,
                       occupancy_cfg=OccupancyConfig(
                           bound=1.0, min_near=0.05, density_thresh=5.0,
                           grid_size=32),
                       march_cfg=MarchConfig(bound=1.0, grid_size=32,
                                             samples_per_ray=16,
                                             min_near=0.05,
                                             coarse_factor=4,
                                             coarse_segments=8))

    tr = mk(False)
    tr.train(ds, max_epochs=1, steps_per_epoch=40)
    img_ctl, dep_ctl = tr.render_full(tr.state.params, ds.poses[0],
                                      ds.intrinsics, 64, 64)
    tr2 = mk(True)
    tr2.state = tr.state
    img_s, dep_s = tr2.render_full(tr.state.params, ds.poses[0],
                                   ds.intrinsics, 64, 64)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_ctl),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep_s), np.asarray(dep_ctl),
                               atol=1e-4)
