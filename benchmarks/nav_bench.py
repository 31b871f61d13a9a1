"""Navigation-loop benchmarks: planner-step ms, filter-step ms, replan Hz.

The BASELINE.json north-star metrics, measured against the analytic textured
scene (workload shapes mirror simulate.py: planner 250-iter replans over a
20-step horizon; filter 1024-ray x 300-iter updates through the renderer).
Prints JSON lines.
"""

import json
import time

import numpy as np


from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays
    from nerfnav_tpu.data.synthetic import textured_sphere_field
    from nerfnav_tpu.models import RenderConfig, render_rays
    from nerfnav_tpu.nav.agent import body_state_to_camera_pose
    from nerfnav_tpu.nav.dynamics import DynamicsConfig
    from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig
    from nerfnav_tpu.nav.planner import Planner, PlannerConfig

    field = textured_sphere_field(radius=0.35)
    density_fn = lambda x: field.density_fn(x)[0]  # noqa: E731

    # ---------------- planner
    pcfg = PlannerConfig(T=20, dt=0.1, epochs_init=100, epochs_update=250)
    s18 = np.zeros(18, np.float32)
    s18[0:3] = [-0.75, 0, 0.1]
    s18[6:15] = np.eye(3).reshape(-1)
    e18 = s18.copy()
    e18[0:3] = [0.75, 0.2, 0.1]
    planner = Planner(s18, e18, pcfg, density_fn)
    planner.learn_init()  # warm the jit
    t0 = time.perf_counter()
    planner.learn_update(0)
    replan_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "planner_replan_ms",
        "value": round(replan_s * 1e3, 1),
        "unit": "ms (250 Adam iters)",
        "per_iter_ms": round(replan_s / 250 * 1e3, 3),
    }))

    # ---------------- filter
    H = W = 800
    focal = 800.0
    intr = jnp.asarray([focal, focal, W / 2, H / 2])
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    render_fn = lambda ro, rd: render_rays(field, rcfg, ro, rd, bg_color=1.0)  # noqa: E731
    get_rays_fn = lambda pose: get_all_rays(pose, intr, H, W)  # noqa: E731
    from nerfnav_tpu.data.rays import get_rays_at

    get_rays_at_fn = lambda pose, inds: get_rays_at(pose, intr, W, inds)  # noqa: E731
    dyn = DynamicsConfig(dt=0.1)
    ecfg = EstimatorConfig(n_iters=300, batch_size=1024)
    est = Estimator(ecfg, dyn, render_fn, get_rays_fn, body_state_to_camera_pose,
                    get_rays_at_fn=get_rays_at_fn)
    x0 = np.zeros(12, np.float32)
    x0[0:3] = [0.0, -1.6, 0.0]
    x0[6:9] = [0.0, 0.0, np.pi / 2]
    est.set_initial_state(x0)
    # synthetic observation rendered from the gt pose (no agent needed)
    pose = np.asarray(body_state_to_camera_pose(jnp.asarray(x0)))
    rng = np.random.default_rng(0)
    obs = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    est.estimate_state(obs, pose, np.array([10.0, 0, 0, 0]))  # warm the jit
    t0 = time.perf_counter()
    est.estimate_state(obs, pose, np.array([10.0, 0, 0, 0]))
    filt_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "filter_update_ms",
        "value": round(filt_s * 1e3, 1),
        "unit": "ms (300 Adam iters x 1024 rays)",
    }))

    print(json.dumps({
        "metric": "replan_loop_hz",
        "value": round(1.0 / (replan_s + filt_s), 3),
        "unit": "Hz (replan + filter per MPC step)",
    }))


if __name__ == "__main__":
    main()
