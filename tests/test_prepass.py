"""Depth-prepass planner: window containment + image equivalence.

The planner's guarantee is CONSERVATIVE WINDOWS: every sample the control
march produces for a chunk must lie inside that chunk's planned depth
window, and a chunk planned as skip must have no occupied samples at all.
Image equivalence is tolerance-based (the shorter bucket ladders sample at
different — finer — positions than the control ladder)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.data.rays import get_all_rays, tile_order
from nerfnav_tpu.data.synthetic import textured_sphere_field
from nerfnav_tpu.models import render_rays_grid_rounds
from nerfnav_tpu.models.prepass import DepthPrepass, full_ladder_steps
from nerfnav_tpu.ops.marching import MarchConfig, march
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


def chunks_of(ro, rd):
    return [(ro[i: i + CHUNK], rd[i: i + CHUNK])
            for i in range(0, H * W, CHUNK)]


def test_windows_contain_control_samples(scene):
    field, mcfg, occupancy, rays, ro, rd, perm = scene
    dp = DepthPrepass(mcfg, H, W, perm, CHUNK, tile=TILE, stride=4)
    plan = dp.plan(occupancy, rays["rays_o"], rays["rays_d"])
    assert len(plan) == (H * W) // CHUNK
    skipped = [t for t, _, _ in plan if t == 0]
    bucketed = [t for t, _, _ in plan if 0 < t < full_ladder_steps(mcfg)]
    assert skipped, "expected some background chunks on this framing"
    assert bucketed, "expected some chunks on a shorter ladder bucket"

    import jax

    march_jit = jax.jit(lambda a, b: march(a, b, occupancy, mcfg))
    for (t_a0, zlo, zhi), (a, b) in zip(plan, chunks_of(ro, rd)):
        m = march_jit(a, b)  # control march, full ladder
        z = np.asarray(m["z"])
        valid = np.asarray(m["valid"])
        if t_a0 == 0:
            assert not valid.any(), "skipped chunk had occupied samples"
            continue
        zs = z[valid]
        if zs.size:
            assert zs.min() >= zlo - 1e-5, (zs.min(), zlo)
            assert zs.max() <= zhi + 1e-5, (zs.max(), zhi)


def test_windows_contain_samples_multicascade():
    """bound=2 (two cascades, like the chip bench scene): windows must stay
    conservative across cascade boundaries and the outer cascade's coarser
    cells."""
    import jax

    mcfg = MarchConfig(bound=2.0, grid_size=32, max_steps=256,
                       samples_per_ray=24, min_near=0.05,
                       coarse_segments=10, coarse_anchors=2)
    Hg = mcfg.grid_size
    ii = np.arange(Hg**3)
    c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) \
        / Hg * 2 - 1
    r = np.linalg.norm(c, axis=-1)
    # inner cascade: shell; outer cascade (cells at 2x scale): far wall slab
    occ0 = (r > 0.3) & (r < 0.5)
    occ1 = np.abs(c[:, 2] - 0.7) < 0.08   # in cascade-1 coords: z ~ 1.4
    occ = np.stack([occ0, occ1])
    f = mcfg.coarse_factor
    hc = Hg // f
    occ_c = occ.reshape(2, hc, f, hc, f, hc, f).max(axis=(2, 4, 6))
    occupancy = {
        "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
        "bitfield_coarse": packbits(
            jnp.asarray(occ_c.reshape(2, -1).astype(np.float32))),
        "blocks": pack_blocks(jnp.asarray(occ), Hg),
        "blocks_coarse": pack_blocks(
            jnp.asarray(occ_c.reshape(2, -1)), hc,
            block=8 if hc % 8 == 0 else 4),
    }
    h = w = 64
    t = 16
    intr = jnp.asarray([45.0, 45.0, w / 2, h / 2])
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -1.8]))
    rays = get_all_rays(pose, intr, h, w)
    perm, _ = tile_order(h, w, t)
    ro = jnp.asarray(np.asarray(rays["rays_o"])[perm])
    rd = jnp.asarray(np.asarray(rays["rays_d"])[perm])
    dp = DepthPrepass(mcfg, h, w, perm, t * t, tile=t, stride=4)
    plan = dp.plan(occupancy, rays["rays_o"], rays["rays_d"])
    march_jit = jax.jit(lambda a, b: march(a, b, occupancy, mcfg))
    checked = 0
    for (t_a0, zlo, zhi), i in zip(plan, range(0, h * w, t * t)):
        m = march_jit(ro[i: i + t * t], rd[i: i + t * t])
        z = np.asarray(m["z"])
        valid = np.asarray(m["valid"])
        if t_a0 == 0:
            assert not valid.any()
            continue
        zs = z[valid]
        if zs.size:
            checked += 1
            assert zs.min() >= zlo - 1e-5, (zs.min(), zlo)
            assert zs.max() <= zhi + 1e-5, (zs.max(), zhi)
    assert checked > 0


def test_trainer_render_full_prepass(tmp_path):
    """Trainer.render_full with eval_prepass on must closely match the
    control staged render on a trained grid-path state."""
    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.data.synthetic import make_synthetic_scene
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    d = str(tmp_path / "scene")
    make_synthetic_scene(d, n_train=4, n_val=1, H=64, W=64, num_steps=48)
    ds = NeRFDataset(DatasetOptions(path=d, scale=1.0), "train")
    cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=12,
                        grid_max_resolution=64)
    rcfg = RenderConfig(num_steps=32, upsample_steps=0, min_near=0.05,
                        max_ray_batch=4096)

    def mk(prepass):
        opt = TrainerOptions(name="pp", workspace=str(tmp_path / "ws"),
                             num_rays=256, use_checkpoint="scratch",
                             bg_train="white", eval_prepass=prepass,
                             eval_prepass_stride=4)
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
    tr.train(ds, max_epochs=1, steps_per_epoch=60)
    img_ctl, dep_ctl = tr.render_full(tr.state.params, ds.poses[0],
                                      ds.intrinsics, 64, 64)
    tr2 = mk(True)
    tr2.state = tr.state
    img_pp, dep_pp = tr2.render_full(tr.state.params, ds.poses[0],
                                     ds.intrinsics, 64, 64)
    mse = float(np.mean((np.asarray(img_ctl) - np.asarray(img_pp)) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 35.0, psnr


def test_plan_cache_reuses_same_pose(tmp_path, monkeypatch):
    """Same-pose re-renders (GUI AA passes) reuse the cached plan; a new
    pose or an occupancy update recomputes it."""
    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.data.synthetic import make_synthetic_scene
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.models.prepass import DepthPrepass
    from nerfnav_tpu.training import Trainer, TrainerOptions

    d = str(tmp_path / "scene")
    make_synthetic_scene(d, n_train=3, n_val=1, H=32, W=32, num_steps=32)
    ds = NeRFDataset(DatasetOptions(path=d, scale=1.0), "train")
    cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=10,
                        grid_max_resolution=32)
    rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1024)
    opt = TrainerOptions(name="pc", workspace=str(tmp_path / "ws"),
                         num_rays=128, use_checkpoint="scratch",
                         bg_train="white", eval_prepass=True,
                         eval_prepass_stride=4)
    tr = Trainer(cfg, rcfg, opt,
                 occupancy_cfg=OccupancyConfig(bound=1.0, min_near=0.05,
                                               density_thresh=5.0,
                                               grid_size=32),
                 march_cfg=MarchConfig(bound=1.0, grid_size=32,
                                       samples_per_ray=16, min_near=0.05,
                                       coarse_segments=8))
    tr.train(ds, max_epochs=1, steps_per_epoch=20)

    calls = {"n": 0}
    orig = DepthPrepass.plan

    def counting_plan(self, occ, ro, rd):
        calls["n"] += 1
        return orig(self, occ, ro, rd)

    monkeypatch.setattr(DepthPrepass, "plan", counting_plan)
    p = tr.state.params
    tr.render_full(p, ds.poses[0], ds.intrinsics, 32, 32)
    assert calls["n"] == 1
    # same pose with an AA subpixel offset: cached plan reused
    tr.render_full(p, ds.poses[0], ds.intrinsics, 32, 32,
                   pixel_offset=(0.25, -0.25))
    assert calls["n"] == 1
    # new pose: recompute
    tr.render_full(p, ds.poses[1], ds.intrinsics, 32, 32)
    assert calls["n"] == 2
    # occupancy update (new state dict object): recompute
    tr.train(ds, max_epochs=1, steps_per_epoch=20)
    tr.render_full(tr.state.params, ds.poses[1], ds.intrinsics, 32, 32)
    assert calls["n"] == 3


def test_prepass_image_matches_control(scene):
    field, mcfg, occupancy, rays, ro, rd, perm = scene
    dp = DepthPrepass(mcfg, H, W, perm, CHUNK, tile=TILE, stride=4)
    plan = dp.plan(occupancy, rays["rays_o"], rays["rays_d"])

    import jax

    ctl_fn = jax.jit(lambda a, b: render_rays_grid_rounds(
        field, occupancy, mcfg, a, b, bg_color=1.0)["image"])
    bucket_fns = {}

    def bucket_fn(t_a0):
        if t_a0 not in bucket_fns:
            mcfg_b = dataclasses.replace(mcfg, t_a0_steps=t_a0)
            bucket_fns[t_a0] = jax.jit(
                lambda a, b, zlo, zhi, m=mcfg_b: render_rays_grid_rounds(
                    field, occupancy, m, a, b, bg_color=1.0,
                    z_window=(zlo, zhi))["image"])
        return bucket_fns[t_a0]

    control, planned = [], []
    for (t_a0, zlo, zhi), (a, b) in zip(plan, chunks_of(ro, rd)):
        control.append(np.asarray(ctl_fn(a, b)))
        if t_a0 == 0:
            planned.append(np.ones_like(control[-1]))
            continue
        out = bucket_fn(t_a0)(a, b, jnp.float32(zlo), jnp.float32(zhi))
        planned.append(np.asarray(out))
    control = np.concatenate(control)
    planned = np.concatenate(planned)
    mse = float(np.mean((control - planned) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    # different ladder resolutions resample the same geometry: high-but-not-
    # exact agreement is the expectation
    assert psnr > 35.0, psnr
    # skipped chunks must be exactly background in the control too
    for (t_a0, _, _), c in zip(plan,
                               control.reshape(-1, CHUNK, 3)):
        if t_a0 == 0:
            np.testing.assert_allclose(c, 1.0, atol=1e-5)
