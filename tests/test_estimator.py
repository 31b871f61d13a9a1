"""Pose filter + agent tests against a textured analytic field — no trained
model needed (closure-injection pattern, reference simulate.py:343-347)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.data.rays import get_all_rays
from nerfnav_tpu.models import RenderConfig, render_rays
from nerfnav_tpu.nav.agent import (
    Agent,
    AgentConfig,
    add_noise_to_state,
    body_state_to_camera_pose,
)
from nerfnav_tpu.nav.dynamics import DynamicsConfig
from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig, find_poi

from nerfnav_tpu.data.synthetic import textured_sphere_field

H = W = 96
FOCAL = 96.0


@pytest.fixture(scope="module")
def field():
    return textured_sphere_field()


@pytest.fixture(scope="module")
def closures(field):
    rcfg = RenderConfig(num_steps=64, upsample_steps=0, min_near=0.05)
    intr = jnp.asarray([FOCAL, FOCAL, W / 2, H / 2])

    def render_fn(ro, rd):
        return render_rays(field, rcfg, ro, rd, bg_color=1.0)

    def get_rays_fn(pose):
        return get_all_rays(pose, intr, H, W)

    return render_fn, get_rays_fn


def start_state():
    """Hovering at -y looking toward the sphere (body +x toward origin ->
    yaw so that +x points at origin)."""
    x = np.zeros(12, np.float32)
    x[0:3] = [0.0, -1.6, 0.0]
    # rotate body +x to point along +y: rotvec = pi/2 about z
    x[6:9] = [0.0, 0.0, np.pi / 2]
    return x


class TestAgent:
    def test_nerf_observation(self, field):
        cfg = AgentConfig(dyn=DynamicsConfig(), H=H, W=W, focal=FOCAL, backend="nerf")
        agent = Agent(start_state(), cfg, field=field, render_chunk=H * W)
        img, state, pose = agent.step(np.array([10.0, 0, 0, 0], np.float32))
        assert img.shape == (H, W, 3) and img.dtype == np.uint8
        # sphere visible: image is not all background
        assert (img < 250).mean() > 0.05
        # hover keeps the state fixed
        np.testing.assert_allclose(state, start_state(), atol=1e-5)

    def test_noise_injection(self):
        s = np.zeros(12, np.float32)
        rng = np.random.default_rng(0)
        s2 = add_noise_to_state(s, std=0.01, rng=rng)
        assert not np.allclose(s2, s)
        assert np.abs(s2).max() < 0.1

    def test_camera_pose_orthonormal(self):
        pose = np.asarray(body_state_to_camera_pose(jnp.asarray(start_state())))
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # camera z (forward) points from (0,-1.6,0) toward origin = +y
        np.testing.assert_allclose(R[:, 2], [0, 1, 0], atol=1e-5)


class TestFindPOI:
    def test_features_on_textured_image(self, field):
        cfg = AgentConfig(dyn=DynamicsConfig(), H=H, W=W, focal=FOCAL, backend="nerf")
        agent = Agent(start_state(), cfg, field=field, render_chunk=H * W)
        img = agent.get_img(np.asarray(body_state_to_camera_pose(jnp.asarray(start_state()))))
        poi = find_poi(img)
        assert len(poi) >= 10  # textured sphere has plenty of corners

    def test_no_features_on_flat_image(self):
        img = np.full((64, 64, 3), 128, np.uint8)
        assert len(find_poi(img)) < 3


class TestEstimator:
    @pytest.mark.parametrize("optimizer", ["adam", "gn"])
    def test_filter_recovers_pose(self, field, closures, optimizer):
        """Perturb the true state; the filter must pull the estimate back
        toward truth using only the rendered observation — both with the
        reference's 300-iter Adam descent and the LM second-order solver."""
        render_fn, get_rays_fn = closures
        x_true = start_state()
        cfg = AgentConfig(dyn=DynamicsConfig(), H=H, W=W, focal=FOCAL, backend="nerf")
        agent = Agent(x_true, cfg, field=field, render_chunk=H * W)
        pose_true = np.asarray(body_state_to_camera_pose(jnp.asarray(x_true)))
        obs = agent.get_img(pose_true)

        est_cfg = EstimatorConfig(lr=5e-3, n_iters=150, batch_size=512,
                                  pool_size=4096, sig0=1.0, q_diag=1e-4,
                                  optimizer=optimizer)
        est = Estimator(est_cfg, DynamicsConfig(), render_fn, get_rays_fn,
                        body_state_to_camera_pose)
        # start from a perturbed belief; hover action keeps prediction there
        x0 = x_true.copy()
        x0[0:3] += [0.06, -0.04, 0.05]
        x0[6:9] += [0.0, 0.0, 0.05]
        est.set_initial_state(x0)
        err_before = np.linalg.norm(x0[0:3] - x_true[0:3])

        x_est = est.estimate_state(obs, pose_true, np.array([10.0, 0, 0, 0]))
        err_after = np.linalg.norm(x_est[0:3] - x_true[0:3])
        assert err_after < err_before * 0.5, (err_before, err_after)
        # covariance is PD and finite
        assert np.all(np.isfinite(est.sig))
        assert np.all(np.linalg.eigvalsh(est.sig) > 0)

    def test_gn_forward_mode_through_grid_renderer(self, field):
        """The LM solver linearizes FORWARD-mode through the render closure;
        the grid fast path (real network: trunc_exp density, hash-grid
        encode, block march) must support jvp end-to-end. Regression for the
        custom_vjp trunc_exp that rejected jax.linearize."""
        from nerfnav_tpu.models import (
            NetworkConfig, init_network, make_field, render_rays_grid,
        )
        from nerfnav_tpu.ops.marching import MarchConfig
        from nerfnav_tpu.ops.morton import pack_blocks, packbits

        cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_level_dim=4,
                            grid_layout="cell", grid_log2_hashmap_size=12,
                            density_scale=50.0)
        net_field = make_field(init_network(jax.random.PRNGKey(0), cfg), cfg)
        mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=128,
                           samples_per_ray=16, min_near=0.05)
        Hg = mcfg.grid_size
        ii = np.arange(Hg**3)
        c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) / Hg * 2 - 1
        occ = (np.linalg.norm(c, axis=-1) < 0.6)
        hc = Hg // mcfg.coarse_factor
        occ_c = occ.reshape(hc, 4, hc, 4, hc, 4).max(axis=(1, 3, 5)).reshape(-1)
        occupancy = {
            "bitfield": jnp.stack([packbits(jnp.asarray(occ, jnp.float32))]),
            "bitfield_coarse": jnp.stack(
                [packbits(jnp.asarray(occ_c, jnp.float32))]),
            "blocks": pack_blocks(jnp.asarray(occ[None]), Hg),
            "blocks_coarse": pack_blocks(jnp.asarray(occ_c[None]), hc, block=8),
        }
        sH = sW = 48
        intr = jnp.asarray([48.0, 48.0, sW / 2, sH / 2])

        def render_fn(ro, rd):
            return render_rays_grid(net_field, occupancy, mcfg, ro, rd,
                                    bg_color=1.0)

        def get_rays_fn(pose):
            return get_all_rays(pose, intr, sH, sW)

        x_true = start_state()
        pose_true = np.asarray(body_state_to_camera_pose(jnp.asarray(x_true)))
        rays = get_rays_fn(jnp.asarray(pose_true))
        obs = np.asarray(
            render_fn(rays["rays_o"], rays["rays_d"])["image"]
        ).reshape(sH, sW, 3)
        obs = (np.clip(obs, 0, 1) * 255).astype(np.uint8)

        est_cfg = EstimatorConfig(n_iters=3, batch_size=256, pool_size=1024,
                                  optimizer="gn")
        est = Estimator(est_cfg, DynamicsConfig(), render_fn, get_rays_fn,
                        body_state_to_camera_pose)
        est.set_initial_state(x_true)
        x_est = est.estimate_state(obs, pose_true, np.array([10.0, 0, 0, 0]))
        assert np.all(np.isfinite(x_est))
        assert np.all(np.isfinite(est.sig))

    def test_frozen_march_filter_recovers_pose(self, field, closures):
        """Frozen-march mode: march once at the predicted pose, optimize the
        pose against the frozen sample lattice. Must recover a perturbed
        pose like the dense path (the lattice marched at the prediction
        still covers the surface for mm-to-cm pose errors)."""
        from nerfnav_tpu.data.rays import get_rays_at
        from nerfnav_tpu.models import render_rays_frozen
        from nerfnav_tpu.ops.marching import MarchConfig, march
        from nerfnav_tpu.ops.morton import pack_blocks, packbits

        render_fn, get_rays_fn = closures
        mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=128,
                           samples_per_ray=24, min_near=0.05)
        Hg = mcfg.grid_size
        ii = np.arange(Hg**3)
        cells = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1)
                 + 0.5) / Hg * 2 - 1
        sig = np.asarray(field.density_fn(jnp.asarray(cells, jnp.float32))[0])
        occ = (sig > 2.0)[None]
        hc = Hg // mcfg.coarse_factor
        f = mcfg.coarse_factor
        occ_c = occ.reshape(1, hc, f, hc, f, hc, f).max(
            axis=(2, 4, 6)).reshape(1, -1)
        occupancy = {
            "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
            "blocks": pack_blocks(jnp.asarray(occ), Hg),
            "blocks_coarse": pack_blocks(jnp.asarray(occ_c), hc, block=8),
        }

        intr = jnp.asarray([FOCAL, FOCAL, W / 2, H / 2])
        x_true = start_state()
        cfg = AgentConfig(dyn=DynamicsConfig(), H=H, W=W, focal=FOCAL,
                          backend="nerf")
        agent = Agent(x_true, cfg, field=field, render_chunk=H * W)
        pose_true = np.asarray(body_state_to_camera_pose(jnp.asarray(x_true)))
        obs = agent.get_img(pose_true)

        est_cfg = EstimatorConfig(batch_size=512, pool_size=4096,
                                  optimizer="gn")
        est = Estimator(
            est_cfg, DynamicsConfig(), render_fn, get_rays_fn,
            body_state_to_camera_pose,
            get_rays_at_fn=lambda pose, inds: get_rays_at(pose, intr, W, inds),
            march_fn=lambda ro, rd: march(ro, rd, occupancy, mcfg),
            render_frozen_fn=lambda ro, rd, z, dt, valid: render_rays_frozen(
                field, 1.0, ro, rd, z, dt, valid, bg_color=1.0),
        )
        x0 = x_true.copy()
        x0[0:3] += [0.05, -0.03, 0.04]
        x0[6:9] += [0.0, 0.0, 0.04]
        est.set_initial_state(x0)
        err_before = np.linalg.norm(x0[0:3] - x_true[0:3])
        x_est = est.estimate_state(obs, pose_true, np.array([10.0, 0, 0, 0]))
        err_after = np.linalg.norm(x_est[0:3] - x_true[0:3])
        assert err_after < err_before * 0.5, (err_before, err_after)
        assert np.all(np.isfinite(est.sig))

    def test_frozen_march_mode_validation(self, closures):
        """Frozen mode demands both closures, get_rays_at_fn, and GN."""
        render_fn, get_rays_fn = closures
        dummy = lambda *a: None  # noqa: E731
        with pytest.raises(ValueError, match="BOTH"):
            Estimator(EstimatorConfig(), DynamicsConfig(), render_fn,
                      get_rays_fn, body_state_to_camera_pose, march_fn=dummy)
        with pytest.raises(ValueError, match="get_rays_at_fn"):
            Estimator(EstimatorConfig(), DynamicsConfig(), render_fn,
                      get_rays_fn, body_state_to_camera_pose,
                      march_fn=dummy, render_frozen_fn=dummy)
        with pytest.raises(ValueError, match="GN"):
            Estimator(EstimatorConfig(optimizer="adam"), DynamicsConfig(),
                      render_fn, get_rays_fn, body_state_to_camera_pose,
                      get_rays_at_fn=dummy, march_fn=dummy,
                      render_frozen_fn=dummy)

    def test_no_features_returns_prior(self, closures):
        render_fn, get_rays_fn = closures
        est = Estimator(EstimatorConfig(), DynamicsConfig(), render_fn,
                        get_rays_fn, body_state_to_camera_pose)
        x0 = start_state()
        est.set_initial_state(x0)
        flat = np.full((H, W, 3), 128, np.uint8)
        x1 = est.estimate_state(flat, None, np.array([10.0, 0, 0, 0]))
        # hover action + no features: prior == propagated state == x0
        np.testing.assert_allclose(x1, x0, atol=1e-4)

    def test_artifacts_written(self, field, closures, tmp_path):
        render_fn, get_rays_fn = closures
        est_cfg = EstimatorConfig(n_iters=5, batch_size=128, pool_size=1024)
        est = Estimator(est_cfg, DynamicsConfig(), render_fn, get_rays_fn,
                        body_state_to_camera_pose, workspace=str(tmp_path))
        est.set_initial_state(start_state())
        cfg = AgentConfig(dyn=DynamicsConfig(), H=H, W=W, focal=FOCAL, backend="nerf")
        agent = Agent(start_state(), cfg, field=field, render_chunk=H * W)
        obs = agent.get_img(np.asarray(body_state_to_camera_pose(jnp.asarray(start_state()))))
        est.estimate_state(obs, np.eye(4), np.array([10.0, 0, 0, 0]))
        import os

        assert os.path.exists(tmp_path / "estimator_data" / "step_0001.json")
