"""FusedMPC equivalence: the one-program MPC tick must reproduce the
unfused four-stage sequence [estimate_state -> update_state -> learn_update
-> get_next_action] bit-for-bit in structure (same rng, same pool, same
epoch clock), numerically to f32 tolerance.

The reference host-orchestrates these stages across separate torch programs
(simulate.py:60-70); the fused program is the TPU-native replacement, so
step-equivalence against our own unfused path is the correctness contract.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.data.rays import get_all_rays
from nerfnav_tpu.data.synthetic import textured_sphere_field
from nerfnav_tpu.models import RenderConfig, render_rays
from nerfnav_tpu.nav.agent import body_state_to_camera_pose
from nerfnav_tpu.nav.dynamics import DynamicsConfig
from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig
from nerfnav_tpu.nav.fused import FusedMPC
from nerfnav_tpu.nav.planner import Planner, PlannerConfig

H = W = 48
FOCAL = 48.0


def _build_pair(field):
    rcfg = RenderConfig(num_steps=32, upsample_steps=0, min_near=0.05)
    intr = jnp.asarray([FOCAL, FOCAL, W / 2, H / 2])

    def render_fn(ro, rd):
        return render_rays(field, rcfg, ro, rd, bg_color=1.0)

    def get_rays_fn(pose):
        return get_all_rays(pose, intr, H, W)

    def density_fn(x):
        return field.density_fn(x)[0]

    dyn = DynamicsConfig(dt=0.2)
    ecfg = EstimatorConfig(lr=5e-3, gn_iters=4, gn_jac_batch=32,
                           batch_size=64, pool_size=512, sig0=1.0)
    filt = Estimator(ecfg, dyn, render_fn, get_rays_fn,
                     body_state_to_camera_pose)
    x0 = np.zeros(12, np.float32)
    x0[0:3] = [0.0, -1.6, 0.0]
    x0[6:9] = [0.0, 0.0, np.pi / 2]
    filt.set_initial_state(x0)

    start18 = np.zeros(18, np.float32)
    start18[0:3] = x0[0:3]
    start18[6:15] = np.eye(3).reshape(-1)
    end18 = start18.copy()
    end18[0:3] = [0.0, 1.2, 0.1]
    pcfg = PlannerConfig(T=5, dt=dyn.dt, epochs_update=10)
    traj = Planner(start18, end18, pcfg, density_fn)
    return filt, traj, x0


@pytest.fixture(scope="module")
def field():
    return textured_sphere_field()


@pytest.fixture(scope="module")
def obs(field):
    from nerfnav_tpu.nav.agent import Agent, AgentConfig

    x0 = np.zeros(12, np.float32)
    x0[0:3] = [0.0, -1.6, 0.0]
    x0[6:9] = [0.0, 0.0, np.pi / 2]
    cfg = AgentConfig(dyn=DynamicsConfig(dt=0.2), H=H, W=W, focal=FOCAL,
                      backend="nerf")
    agent = Agent(x0, cfg, field=field, render_chunk=H * W)
    pose = np.asarray(body_state_to_camera_pose(jnp.asarray(x0)))
    return agent.get_img(pose), pose


@pytest.mark.slow
def test_fused_tick_matches_unfused_sequence(field, obs):
    img, pose = obs
    action = np.array([10.0, 0, 0, 0], np.float32)

    filt_a, traj_a, _ = _build_pair(field)
    filt_b, traj_b, _ = _build_pair(field)
    fused = FusedMPC(filt_b, traj_b, H, W)

    for tick in range(2):
        # ---- unfused four-stage sequence
        x_a = filt_a.estimate_state(img, pose, action)
        traj_a.update_state(x_a)
        traj_a.learn_update(tick)
        act_a = np.asarray(traj_a.get_next_action())
        # ---- fused one-program tick
        x_b, act_b = fused.step(img, action)
        x_b, act_b = np.asarray(x_b), np.asarray(act_b)

        np.testing.assert_allclose(np.asarray(x_a), x_b, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(filt_a.sig, filt_b.sig, rtol=2e-3,
                                   atol=2e-4)
        assert traj_a.active == traj_b.active
        np.testing.assert_allclose(np.asarray(traj_a.states),
                                   np.asarray(traj_b.states),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(act_a, act_b, rtol=2e-3, atol=2e-4)
        action = act_a  # drive both from the same action stream


def test_fused_requires_static_horizon(field):
    import dataclasses

    filt, traj, _ = _build_pair(field)
    traj.cfg = dataclasses.replace(traj.cfg, static_horizon=False)
    with pytest.raises(ValueError):
        FusedMPC(filt, traj, H, W)
