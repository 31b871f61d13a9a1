"""Navigation simulation CLI — the full plan / act / estimate / replan loop.

Capability parity: reference simulate.py —
  * `simulate()` orchestration (18-103): workspace tree -> Planner
    (a_star_init + learn_init) -> Agent + Estimator -> per-step
    [get_next_action -> agent.step(+noise) -> filter.estimate_state ->
    traj.update_state -> learn_update], last `open_loop_steps` steps open-loop
  * nav configs inline with the reference's values (200-334): estimator
    lr 1e-3 / 300 iters / 1024 rays; body 0.1x0.1x0.04 m; Stonehenge start
    [0.39,-0.67,0.2] -> goal [-0.4,0.55,0.16]; T=2 s over 20 steps; planner
    lr 1e-3, 2500/250 epochs; MPC noise
  * the three closures injected into the nav stack (336-347)
  * `-O` disables the grid path: nav differentiates through the renderer
    (163-166)

Observation backends: "nerf" (default, Blender-free — BASELINE.json
sanctioned) or "blender" (the preserved sim_img_cache file-RPC protocol).
"""

import os
import sys

import numpy as np


def simulate(traj, agent, filt, steps: int = 20, open_loop_steps: int = 5,
             noise_std: float = 0.0, noise_mean: float = 0.0, seed: int = 0,
             on_step=None, fused=None):
    """The reference main loop (simulate.py:18-103). Returns the list of
    (true_state, estimated_state) pairs.

    fused: optional nav.fused.FusedMPC — runs each closed-loop tick's
    estimate + pop + replan + next-action as ONE jitted program instead of
    the four host-orchestrated stages (step-equivalent; see
    tests/test_nav_fused.py)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    history = []
    action_next = None
    try:
        for it in range(steps):
            action = (np.asarray(traj.get_next_action())
                      if action_next is None else np.asarray(action_next))
            action_next = None
            img, true_state, pose = agent.step(
                action, noise_std=noise_std, noise_mean=noise_mean, rng=rng
            )
            if it < steps - open_loop_steps:
                if fused is not None:
                    x_est, action_next = fused.step(img, action)
                    x_est = np.asarray(x_est)
                else:
                    x_est = filt.estimate_state(img, pose, action)
                    traj.update_state(x_est)
                    traj.learn_update(it)
            else:
                # open-loop tail (reference simulate.py:71-98)
                x_est = np.asarray(filt.xt) if filt.xt is not None else true_state[:12]
                traj.update_state(true_state[:12] if len(true_state) >= 12 else x_est)
            history.append((true_state.copy(), np.asarray(x_est).copy()))
            if on_step is not None:
                on_step(it, history[-1])
    except KeyboardInterrupt:
        # graceful early end (reference simulate.py:101-102)
        pass
    return history


def build_sim_parser():
    """The simulate entry's argparse (reference simulate.py:109-158 plus the
    nav-loop product flags); factored out so tests can assert the defaults
    without running the loop."""
    from nerfnav_tpu.cli.flags import build_parser

    parser = build_parser("nerfnav_tpu navigation simulation")
    parser.add_argument("--sim_backend", type=str, default="nerf",
                        choices=["nerf", "blender"])
    parser.add_argument("--blend_file", type=str, default="")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--open_loop_steps", type=int, default=5)
    parser.add_argument("--mpc_noise_std", type=float, default=2e-3)
    parser.add_argument("--mpc_noise_mean", type=float, default=0.0)
    parser.add_argument("--start", type=float, nargs=3, default=[0.39, -0.67, 0.2])
    parser.add_argument("--goal", type=float, nargs=3, default=[-0.4, 0.55, 0.16])
    parser.add_argument("--planner_lr", type=float, default=1e-3)
    parser.add_argument("--astar_thresh", type=float, default=0.3,
                        help="A* occupancy threshold on maxpooled density "
                        "(reference quad_plot.py:70-76)")
    parser.add_argument("--epochs_init", type=int, default=2500)
    parser.add_argument("--epochs_update", type=int, default=250)
    parser.add_argument("--estimator_lr", type=float, default=1e-3)
    parser.add_argument("--estimator_iters", type=int, default=300)
    parser.add_argument("--estimator_batch", type=int, default=1024)
    parser.add_argument("--obs_res", type=int, default=800)
    parser.add_argument("--obs_focal", type=float, default=800.0)
    parser.add_argument("--analytic", action="store_true",
                        help="run against the built-in analytic scene (no ckpt)")
    parser.add_argument("--fused_cycle", action="store_true", default=True,
                        help="run each closed-loop MPC tick (filter update + "
                        "waypoint pop + replan + next action) as ONE jitted "
                        "program (nav.fused.FusedMPC; GN filter path only). "
                        "DEFAULT since round 5: chip-measured 91.9 ms = "
                        "10.9 Hz at 0.7 mm hover drift with the orb/ds2 "
                        "front-end — at the planner's 10 Hz mission rate "
                        "(dt = 0.1 s). Headless: per-epoch replan/estimator "
                        "artifacts are skipped during fused ticks")
    parser.add_argument("--no_fused", dest="fused_cycle",
                        action="store_false",
                        help="run the unfused four-stage loop instead "
                        "(separate filter/pop/replan programs; keeps the "
                        "reference's per-step JSON artifact cadence)")
    parser.add_argument("--poi_backend", type=str, default="orb",
                        choices=["sift", "orb", "corners"],
                        help="measurement front-end detector (the filter "
                        "consumes only the dilated interest MASK). Default "
                        "orb: 13.3 ms detect vs sift's 27.7 on the 800^2 "
                        "obs — the difference between 8.9 and 10.9 Hz ticks "
                        "— at 0.7 mm vs 0.4 mm chip hover drift (both "
                        "within the <= 1 mm bar). --poi_backend sift "
                        "restores reference parity (estimator_helpers."
                        "py:37-68)")
    parser.add_argument("--poi_downscale", type=int, default=2,
                        help="detector downscale (mask upsampled back; 2 = "
                        "measured default, 1 = reference full-res)")
    parser.add_argument("--filter_render", type=str, default="dense",
                        choices=["dense", "grid", "frozen"],
                        help="pose-filter render path: 'dense' = the "
                        "reference's differentiable run() (simulate.py:163-"
                        "166 sets cuda_ray=False for exactly this); 'grid' = "
                        "the occupancy fast path, which here IS pose-"
                        "differentiable (sample positions are stop-gradded "
                        "but o + d*z keeps ray grads) — but re-marches every "
                        "iteration (measured slower than dense at nav batch "
                        "sizes); 'frozen' = march ONCE per update at the "
                        "predicted pose, then every LM iteration shades only "
                        "the K occupancy-pruned samples (GN optimizer only). "
                        "grid/frozen need a full checkpoint with occupancy "
                        "state (fall back to dense with a warning).")
    return parser


def main(argv=None):
    from nerfnav_tpu.cli.flags import make_configs
    from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

    # persistent executable cache: the fused MPC tick costs ~29 min to
    # compile cold — cached warm starts make the nav loop usable after a
    # reboot (round-5 product compile-cache story)
    enable_compilation_cache()
    parser = build_sim_parser()
    opt = parser.parse_args(argv)
    opt.cuda_ray = False
    cfg, rcfg, _, _ = make_configs(opt, for_nav=True)
    # nav render path: fewer samples than full quality, differentiable
    from nerfnav_tpu.models import RenderConfig

    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=opt.min_near,
                        max_ray_batch=opt.max_ray_batch)

    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays
    from nerfnav_tpu.models import make_field, render_rays
    from nerfnav_tpu.nav.agent import Agent, AgentConfig, body_state_to_camera_pose
    from nerfnav_tpu.nav.dynamics import DynamicsConfig
    from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig
    from nerfnav_tpu.nav.planner import Planner, PlannerConfig

    # ---- field: trained checkpoint or analytic demo scene
    occupancy_state = None
    if opt.analytic:
        from nerfnav_tpu.data.synthetic import textured_sphere_field

        field = textured_sphere_field()
    else:
        from nerfnav_tpu.models import init_network
        from nerfnav_tpu.models.occupancy import OccupancyConfig, init_occupancy_state
        from nerfnav_tpu.training import checkpoint as ckpt_lib
        import jax

        params_tmpl = init_network(jax.random.PRNGKey(0), cfg)
        ckpt_path = opt.ckpt
        if ckpt_path in ("latest", "best"):
            cdir = os.path.join(opt.workspace, "checkpoints")
            ckpt_path = (
                os.path.join(cdir, "ngp_best.npz") if opt.ckpt == "best"
                else ckpt_lib.latest_checkpoint(cdir, "ngp")
            )
        if ckpt_path is None or not os.path.exists(ckpt_path):
            raise FileNotFoundError(
                f"no checkpoint at {ckpt_path}; train first or pass --analytic"
            )
        if "best" in os.path.basename(ckpt_path):
            params, meta, _ = ckpt_lib.load_checkpoint(ckpt_path, params_tmpl)
            # a checkpoint trained under other --grid_* flags (or a torch-ngp
            # import needing --grid_coord_convention ngp) must fail loudly —
            # the nav stack on a mis-latticed field fails silently otherwise
            ckpt_lib.check_grid_meta(meta, cfg, ckpt_path)
        else:
            # full trainer checkpoint: take the EMA params (what the
            # reference evaluates with) + occupancy state for the fast path
            occ_tmpl = init_occupancy_state(
                OccupancyConfig(bound=opt.bound, min_near=opt.min_near,
                                grid_size=opt.grid_size)
            )
            tmpl = {"ema_params": params_tmpl, "occupancy": occ_tmpl}
            tree, meta, report = ckpt_lib.load_checkpoint(ckpt_path, tmpl)
            ckpt_lib.check_grid_meta(meta, cfg, ckpt_path)
            params = tree["ema_params"]
            if not any("occupancy" in r for r in report):
                occupancy_state = tree["occupancy"]
        field = make_field(params, cfg)

    # ---- the three closures (reference simulate.py:336-347)
    def density_fn(x):
        return field.density_fn(x)[0]

    march_fn = render_frozen_fn = None
    if opt.filter_render == "grid" and occupancy_state is not None:
        from nerfnav_tpu.models import render_rays_grid
        from nerfnav_tpu.ops.marching import MarchConfig

        nav_mcfg = MarchConfig(bound=opt.bound, max_steps=opt.max_steps,
                               samples_per_ray=64, min_near=opt.min_near,
                               grid_size=opt.grid_size)

        def render_fn(ro, rd):
            return render_rays_grid(field, occupancy_state, nav_mcfg, ro, rd,
                                    bg_color=1.0)
    elif opt.filter_render == "frozen" and occupancy_state is not None:
        from nerfnav_tpu.models import render_rays_frozen
        from nerfnav_tpu.ops.marching import MarchConfig, march

        nav_mcfg = MarchConfig(bound=opt.bound, max_steps=opt.max_steps,
                               samples_per_ray=64, min_near=opt.min_near,
                               grid_size=opt.grid_size)

        def march_fn(ro, rd):
            return march(ro, rd, occupancy_state, nav_mcfg)

        def render_frozen_fn(ro, rd, z, dt, valid):
            return render_rays_frozen(field, opt.bound, ro, rd, z, dt, valid,
                                      bg_color=1.0)

        def render_fn(ro, rd):   # debug/triptych renders stay dense
            return render_rays(field, rcfg, ro, rd, bg_color=1.0)
    else:
        if opt.filter_render in ("grid", "frozen"):
            print(f"[simulate] WARNING: --filter_render {opt.filter_render} "
                  "needs a full checkpoint with occupancy state; using dense")

        def render_fn(ro, rd):
            return render_rays(field, rcfg, ro, rd, bg_color=1.0)

    H = W = opt.obs_res
    intr = jnp.asarray([opt.obs_focal, opt.obs_focal, W / 2, H / 2])

    def get_rays_fn(pose):
        return get_all_rays(pose, intr, H, W)

    def get_rays_at_fn(pose, inds):
        from nerfnav_tpu.data.rays import get_rays_at

        return get_rays_at(pose, intr, W, inds)

    # ---- configs (reference simulate.py:200-334)
    dyn = DynamicsConfig(dt=2.0 / opt.steps)
    pcfg = PlannerConfig(
        T=opt.steps, dt=dyn.dt, lr=opt.planner_lr,
        epochs_init=opt.epochs_init, epochs_update=opt.epochs_update,
        bound=min(opt.bound, 1.0), astar_thresh=opt.astar_thresh,
    )
    start18 = np.zeros(18, np.float32)
    start18[0:3] = opt.start
    start18[6:15] = np.eye(3).reshape(-1)
    end18 = start18.copy()
    end18[0:3] = opt.goal

    ws = opt.workspace
    os.makedirs(ws, exist_ok=True)
    # fused mode is headless by construction (the per-epoch artifact cadence
    # would force a host round-trip inside the one-program tick)
    traj = Planner(start18, end18, pcfg, density_fn,
                   workspace=None if opt.fused_cycle else ws, exp_name="sim")
    print("[simulate] A* warm start...")
    traj.a_star_init()
    print("[simulate] initial trajectory optimization...")
    traj.learn_init()

    start12 = np.concatenate([start18[0:3], start18[3:6], np.zeros(3), start18[15:18]])
    acfg = AgentConfig(dyn=dyn, H=H, W=W, focal=opt.obs_focal,
                       backend=opt.sim_backend, blend_file=opt.blend_file)
    agent = Agent(start12.astype(np.float32), acfg, field=field)
    ecfg = EstimatorConfig(lr=opt.estimator_lr, n_iters=opt.estimator_iters,
                           batch_size=opt.estimator_batch,
                           poi_backend=opt.poi_backend,
                           poi_downscale=opt.poi_downscale)
    filt = Estimator(ecfg, dyn, render_fn, get_rays_fn,
                     body_state_to_camera_pose, workspace=ws,
                     get_rays_at_fn=get_rays_at_fn,
                     march_fn=march_fn, render_frozen_fn=render_frozen_fn)
    filt.set_initial_state(start12)

    def on_step(it, pair):
        true_s, est_s = pair
        err = np.linalg.norm(true_s[0:3] - est_s[0:3])
        print(f"[simulate] step {it}: pos err {err:.4f}  true {true_s[0:3]}")

    fused = None
    if opt.fused_cycle:
        from nerfnav_tpu.nav.fused import FusedMPC

        fused = FusedMPC(filt, traj, H, W)
    history = simulate(traj, agent, filt, steps=opt.steps,
                       open_loop_steps=opt.open_loop_steps,
                       noise_std=opt.mpc_noise_std,
                       noise_mean=opt.mpc_noise_mean, seed=opt.seed,
                       on_step=on_step, fused=fused)
    final = history[-1][0]
    goal_err = np.linalg.norm(final[0:3] - np.asarray(opt.goal))
    print(f"[simulate] done: {len(history)} steps, final goal error {goal_err:.4f}")
    return history


if __name__ == "__main__":
    main(sys.argv[1:])
