"""Full closed-loop nav integration test: plan -> act -> observe -> estimate
-> replan, against the textured analytic scene (no trained model, no Blender
— the reference's north star explicitly sanctions NeRF-rendered
observations)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.cli.simulate import simulate
from nerfnav_tpu.data.rays import get_all_rays
from nerfnav_tpu.data.synthetic import textured_sphere_field
from nerfnav_tpu.models import RenderConfig, render_rays
from nerfnav_tpu.nav.agent import Agent, AgentConfig, body_state_to_camera_pose
from nerfnav_tpu.nav.dynamics import DynamicsConfig
from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig
from nerfnav_tpu.nav.planner import Planner, PlannerConfig


@pytest.mark.slow
def test_closed_loop_navigation(tmp_path):
    field = textured_sphere_field(radius=0.35)
    rcfg = RenderConfig(num_steps=48, upsample_steps=0, min_near=0.05)
    H = W = 72
    focal = 72.0
    intr = jnp.asarray([focal, focal, W / 2, H / 2])

    def density_fn(x):
        return field.density_fn(x)[0]

    def render_fn(ro, rd):
        return render_rays(field, rcfg, ro, rd, bg_color=1.0)

    def get_rays_fn(pose):
        return get_all_rays(pose, intr, H, W)

    steps = 8
    dyn = DynamicsConfig(dt=2.0 / steps)
    pcfg = PlannerConfig(T=steps, dt=dyn.dt, epochs_init=400, epochs_update=60,
                         astar_fine=40, astar_coarse=20)
    start18 = np.zeros(18, np.float32)
    start18[0:3] = [-0.75, 0.0, 0.1]
    start18[6:15] = np.eye(3).reshape(-1)
    end18 = start18.copy()
    end18[0:3] = [0.75, 0.2, 0.1]

    traj = Planner(start18, end18, pcfg, density_fn, workspace=str(tmp_path),
                   exp_name="t")
    traj.a_star_init()
    traj.learn_init()

    # planned trajectory avoids the sphere obstacle
    plan = np.asarray(traj.get_full_states()["pos"])
    assert np.min(np.linalg.norm(plan, axis=-1)) > 0.3

    start12 = np.zeros(12, np.float32)
    start12[0:3] = start18[0:3]
    acfg = AgentConfig(dyn=dyn, H=H, W=W, focal=focal, backend="nerf")
    agent = Agent(start12, acfg, field=field, render_chunk=H * W)
    ecfg = EstimatorConfig(lr=5e-3, n_iters=60, batch_size=256, pool_size=2048,
                           sig0=1.0)
    filt = Estimator(ecfg, dyn, render_fn, get_rays_fn,
                     body_state_to_camera_pose, workspace=str(tmp_path))
    filt.set_initial_state(start12)

    # the plan spans T+4 actions; execute them all (closed loop then tail)
    n_exec = steps + 4
    history = simulate(traj, agent, filt, steps=n_exec, open_loop_steps=5,
                       noise_std=1e-3, seed=0)
    assert len(history) == n_exec

    # the vehicle made substantial progress toward the goal
    d_start = np.linalg.norm(start18[0:3] - end18[0:3])
    d_final = min(
        np.linalg.norm(np.asarray(t[0:3]) - end18[0:3]) for t, _ in history
    )
    assert d_final < 0.5 * d_start, (d_start, d_final)

    # filter tracked the true state through the closed-loop phase
    errs = [np.linalg.norm(t[0:3] - e[0:3]) for t, e in history[: n_exec - 5]]
    assert max(errs) < 0.25, errs

    # artifacts exist
    import os

    assert os.path.exists(tmp_path / "estimator_data" / "step_0001.json")
    assert os.path.exists(tmp_path / "replan_poses" / "t")
