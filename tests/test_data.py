import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.data import NeRFDataset, get_rays, get_all_rays, nerf_matrix_to_ngp
from nerfnav_tpu.data.provider import DatasetOptions, ngp_to_nerf_matrix
from nerfnav_tpu.data.synthetic import make_synthetic_scene, sphere_field


class TestPoseConvention:
    def test_ngp_roundtrip(self):
        rng = np.random.default_rng(0)
        # random valid c2w: orthonormal rotation + translation
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = q
        pose[:3, 3] = rng.normal(size=3)
        ngp = nerf_matrix_to_ngp(pose, scale=0.5, offset=(0.1, 0.2, 0.3))
        back = ngp_to_nerf_matrix(ngp, scale=0.5, offset=(0.1, 0.2, 0.3))
        np.testing.assert_allclose(back, pose, atol=1e-5)

    def test_rotation_stays_orthonormal(self):
        rng = np.random.default_rng(1)
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = q
        ngp = nerf_matrix_to_ngp(pose, scale=1.0)
        R = ngp[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestRays:
    def test_principal_point_ray_is_forward(self):
        H = W = 8
        intr = jnp.asarray([10.0, 10.0, 4.0, 4.0])
        pose = jnp.eye(4)
        rays = get_all_rays(pose, intr, H, W)
        # center pixel (3.5+0.5=4.0=cx): direction should be +z (camera forward)
        center = 4 * W + 4
        d = np.asarray(rays["rays_d"][center - W - 1])  # pixel (3,3): +0.5 center = cx
        # instead check the exact pixel whose center hits the principal point
        # pixel i=3.5 doesn't exist; check symmetry: mean direction ~ +z
        mean_d = np.asarray(rays["rays_d"]).mean(0)
        mean_d /= np.linalg.norm(mean_d)
        np.testing.assert_allclose(mean_d, [0, 0, 1], atol=1e-2)

    def test_sampled_rays_subset_of_full(self):
        H = W = 16
        intr = jnp.asarray([12.0, 12.0, 8.0, 8.0])
        pose = jnp.eye(4)
        full = get_all_rays(pose, intr, H, W)
        sub = get_rays(pose, intr, H, W, 32, jax.random.PRNGKey(0))
        inds = np.asarray(sub["inds"])
        np.testing.assert_allclose(
            np.asarray(sub["rays_d"]), np.asarray(full["rays_d"])[inds], atol=1e-6
        )

    def test_error_map_biases_sampling(self):
        H = W = 128
        intr = jnp.asarray([64.0, 64.0, 64.0, 64.0])
        pose = jnp.eye(4)
        emap = jnp.full((128 * 128,), 1e-6).at[0].set(1.0)  # all mass at bin 0
        rays = get_rays(pose, intr, H, W, 256, jax.random.PRNGKey(0), emap)
        inds = np.asarray(rays["inds"])
        # bin 0 covers pixel block [0,1)x[0,1) at this res -> pixel 0
        assert (inds == 0).mean() > 0.95

    def test_rays_differentiable_wrt_pose(self):
        H = W = 8
        intr = jnp.asarray([10.0, 10.0, 4.0, 4.0])

        def f(t):
            pose = jnp.eye(4).at[:3, 3].set(t)
            return jnp.sum(get_all_rays(pose, intr, H, W)["rays_o"])

        g = jax.grad(f)(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(g), [64.0, 64.0, 64.0], atol=1e-4)


class TestSyntheticScene(object):
    @pytest.fixture(scope="class")
    def scene_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("scene")
        make_synthetic_scene(str(d), n_train=3, n_val=1, H=32, W=32, num_steps=64)
        return str(d)

    def test_files_written(self, scene_dir):
        assert os.path.exists(os.path.join(scene_dir, "transforms_train.json"))
        with open(os.path.join(scene_dir, "transforms_train.json")) as f:
            meta = json.load(f)
        assert len(meta["frames"]) == 3

    def test_provider_loads(self, scene_dir):
        ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), split="train")
        assert ds.mode == "blender"
        assert ds.poses.shape == (3, 4, 4)
        assert ds.images.shape == (3, 32, 32, 4)
        assert ds.H == ds.W == 32
        # focal from camera_angle_x
        fov = 0.9
        np.testing.assert_allclose(
            ds.intrinsics[0], 32 / (2 * np.tan(fov / 2)), rtol=1e-5
        )

    def test_reprojection_consistency(self, scene_dir):
        """Provider poses + our rays re-render to (approximately) the stored
        image: the full convention loop (write->load->render) is consistent."""
        from nerfnav_tpu.models import RenderConfig, render_rays

        ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), split="train")
        field = sphere_field()
        rcfg = RenderConfig(num_steps=64, upsample_steps=0, min_near=0.05)
        rays = get_all_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                            ds.H, ds.W)
        out = render_rays(field, rcfg, rays["rays_o"], rays["rays_d"], bg_color=0.0)
        rendered = np.asarray(out["image"]).reshape(ds.H, ds.W, 3)
        stored = ds.images[0]
        composited = stored[..., :3] * stored[..., 3:]
        assert np.abs(rendered - composited).mean() < 0.02


def test_get_rays_at_matches_full_image():
    """Index-based ray gen (the pose filter's per-iteration path) must equal
    gathering the same pixels from the full-image rays, and stay
    differentiable w.r.t. pose."""
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays, get_rays_at

    H = W = 24
    intr = jnp.asarray([30.0, 30.0, W / 2, H / 2])
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.1, -0.2, -1.3]))
    inds = jnp.asarray([0, 5, 100, W * H - 1, 311])
    full = get_all_rays(pose, intr, H, W)
    at = get_rays_at(pose, intr, W, inds)
    np.testing.assert_allclose(np.asarray(at["rays_o"]),
                               np.asarray(full["rays_o"][inds]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(at["rays_d"]),
                               np.asarray(full["rays_d"][inds]), atol=1e-6)

    def f(p):
        return jnp.sum(get_rays_at(p, intr, W, inds)["rays_d"])

    g = np.asarray(jax.grad(f)(pose))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
