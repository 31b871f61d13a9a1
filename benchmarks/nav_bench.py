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
    import argparse

    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays
    from nerfnav_tpu.data.synthetic import textured_sphere_field
    from nerfnav_tpu.models import RenderConfig, render_rays, render_rays_grid
    from nerfnav_tpu.nav.agent import body_state_to_camera_pose
    from nerfnav_tpu.nav.dynamics import DynamicsConfig
    from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig
    from nerfnav_tpu.nav.planner import Planner, PlannerConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.ops.morton import pack_blocks, packbits

    p = argparse.ArgumentParser()
    p.add_argument("--filter_render", default="dense",
                   choices=["dense", "grid", "frozen", "both", "all"],
                   help="filter measurement path(s): the reference uses the "
                        "dense differentiable renderer (simulate.py:163-166);"
                        " grid routes through the occupancy fast path "
                        "(chip A/B round 1: dense wins — the march re-runs "
                        "every iteration); frozen marches ONCE per update at "
                        "the predicted pose and shades K pruned samples per "
                        "LM iteration (GN only); both = dense+grid, all = "
                        "dense+grid+frozen")
    p.add_argument("--filter_opt", default="both", choices=["adam", "gn", "both"],
                   help="pose optimizer A/B: reference 300-iter Adam vs "
                        "Levenberg-Marquardt (EstimatorConfig.optimizer)")
    p.add_argument("--gn_iters", type=int, default=15,
                   help="LM iterations (EstimatorConfig.gn_iters sweep)")
    p.add_argument("--jac_batch", type=int, default=256,
                   help="LM Jacobian ray subset (EstimatorConfig.gn_jac_batch)")
    p.add_argument("--replan_iters", type=int, default=250,
                   help="planner Adam iterations per MPC replan "
                        "(reference 250, simulate.py:253-260; the warm-"
                        "started incremental replan converges far earlier)")
    p.add_argument("--poi_backend", default="sift",
                   choices=["sift", "orb", "corners"],
                   help="filter front-end detector (EstimatorConfig)")
    p.add_argument("--poi_downscale", type=int, default=1,
                   help="front-end detection downscale (EstimatorConfig)")
    p.add_argument("--profile_filter", action="store_true",
                   help="break the frozen-GN filter update into host "
                        "front-end (SIFT, mask, image ops) and fused-program "
                        "dispatch timings (3 reps each)")
    p.add_argument("--skip_planner", action="store_true",
                   help="filter-only run (saves the planner warm-up when "
                        "sweeping filter knobs)")
    p.add_argument("--fused_cycle", action="store_true",
                   help="measure the ONE-PROGRAM MPC tick (nav.fused."
                        "FusedMPC: GN filter update + pop + replan + next "
                        "action) — a directly-timed loop Hz, replacing the "
                        "replan_s + filt_s sum")
    p.add_argument("--horizon", default="static",
                   choices=["static", "legacy", "both"],
                   help="MPC re-root mode for the mpc_step measurement: "
                        "static reuses one compiled replan program (traced "
                        "active count); legacy pops+shrinks like the "
                        "reference, recompiling every step")
    args = p.parse_args()

    field = textured_sphere_field(radius=0.35)
    density_fn = lambda x: field.density_fn(x)[0]  # noqa: E731

    # ---------------- planner
    pcfg = PlannerConfig(T=20, dt=0.1, epochs_init=100,
                         epochs_update=args.replan_iters)
    s18 = np.zeros(18, np.float32)
    s18[0:3] = [-0.75, 0, 0.1]
    s18[6:15] = np.eye(3).reshape(-1)
    e18 = s18.copy()
    e18[0:3] = [0.75, 0.2, 0.1]
    replan_s = None
    if not args.skip_planner:
        planner = Planner(s18, e18, pcfg, density_fn)
        planner.learn_init()  # warm the jit
        t0 = time.perf_counter()
        planner.learn_update(0)
        replan_s = time.perf_counter() - t0
        print(json.dumps({
            "metric": "planner_replan_ms",
            "value": round(replan_s * 1e3, 1),
            "unit": f"ms ({args.replan_iters} Adam iters)",
            "per_iter_ms": round(replan_s / args.replan_iters * 1e3, 3),
        }))

    # ---------------- MPC re-rooting: update_state + learn_update per step.
    # The steady-state replan above never pops a waypoint; real missions do,
    # and the reference's pop-and-shrink forces a fresh trace+compile per MPC
    # step. static_horizon (default) replays ONE compiled program.
    import dataclasses as _dc

    modes = ([] if args.skip_planner
             else ["static", "legacy"] if args.horizon == "both"
             else [args.horizon])
    for mode in modes:
        # legacy recompiles per step (minutes each through the remote-compile
        # relay) — keep it to 2 steps; static gets a representative 5
        n_steps = 5 if mode == "static" else 2
        mcfg_p = _dc.replace(pcfg, static_horizon=(mode == "static"))
        pl = Planner(s18, e18, mcfg_p, density_fn)
        pl.learn_init()  # warms the full-horizon program
        t0 = time.perf_counter()
        for it in range(n_steps):
            full = pl.get_full_states()
            est12 = np.zeros(12, np.float32)
            est12[0:3] = np.asarray(full["pos"][4])
            pl.update_state(est12)
            pl.learn_update(it)
        step_ms = (time.perf_counter() - t0) / n_steps * 1e3
        print(json.dumps({
            "metric": f"mpc_step_ms_{mode}",
            "value": round(step_ms, 1),
            "unit": f"ms (update_state + {args.replan_iters}-iter replan, "
                    f"{n_steps} steps)",
        }))

    # ---------------- filter
    H = W = 800
    focal = 800.0
    intr = jnp.asarray([focal, focal, W / 2, H / 2])
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.05)
    dense_render = lambda ro, rd: render_rays(field, rcfg, ro, rd, bg_color=1.0)  # noqa: E731

    # occupancy state for the grid-routed filter, built from the analytic
    # density exactly like a converged trainer state (simulate.py:156-166)
    mcfg = MarchConfig(bound=1.0, grid_size=128, max_steps=512,
                       samples_per_ray=64, min_near=0.05)
    Hg = mcfg.grid_size
    ii = np.arange(Hg**3)
    cells = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) / Hg * 2 - 1
    sig = np.asarray(field.density_fn(jnp.asarray(cells, jnp.float32))[0])
    occ = (sig > 2.0)[None]
    hc = Hg // mcfg.coarse_factor
    f = mcfg.coarse_factor
    occ_c = occ.reshape(1, hc, f, hc, f, hc, f).max(axis=(2, 4, 6)).reshape(1, -1)
    occupancy = {
        "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
        "blocks": pack_blocks(jnp.asarray(occ), Hg),
        "blocks_coarse": pack_blocks(jnp.asarray(occ_c), hc,
                                     block=8 if hc % 8 == 0 else 4),
    }
    grid_render = lambda ro, rd: render_rays_grid(  # noqa: E731
        field, occupancy, mcfg, ro, rd, bg_color=1.0)
    from nerfnav_tpu.models import render_rays_frozen
    from nerfnav_tpu.ops.marching import march as march_op

    march_fn = lambda ro, rd: march_op(ro, rd, occupancy, mcfg)  # noqa: E731
    frozen_render = lambda ro, rd, z, dt, valid: render_rays_frozen(  # noqa: E731
        field, 1.0, ro, rd, z, dt, valid, bg_color=1.0)

    get_rays_fn = lambda pose: get_all_rays(pose, intr, H, W)  # noqa: E731
    from nerfnav_tpu.data.rays import get_rays_at

    get_rays_at_fn = lambda pose, inds: get_rays_at(pose, intr, W, inds)  # noqa: E731
    dyn = DynamicsConfig(dt=0.1)
    ecfg = EstimatorConfig(n_iters=300, batch_size=1024,
                           gn_iters=args.gn_iters,
                           gn_jac_batch=args.jac_batch,
                           poi_backend=args.poi_backend,
                           poi_downscale=args.poi_downscale)
    x0 = np.zeros(12, np.float32)
    x0[0:3] = [0.0, -1.6, 0.0]
    x0[6:9] = [0.0, 0.0, np.pi / 2]
    pose = np.asarray(body_state_to_camera_pose(jnp.asarray(x0)))
    # observation rendered from the gt pose (realistic SIFT content)
    rays = get_all_rays(jnp.asarray(pose), intr, H, W)
    obs_chunks = []
    for i in range(0, H * W, 8192):
        obs_chunks.append(np.asarray(dense_render(
            rays["rays_o"][i : i + 8192], rays["rays_d"][i : i + 8192])["image"]))
    obs = (np.concatenate(obs_chunks).reshape(H, W, 3) * 255).astype(np.uint8)

    if args.profile_filter:
        import dataclasses

        from nerfnav_tpu.nav.estimator import find_poi, interest_region_mask

        cfg_i = dataclasses.replace(ecfg, optimizer="gn")
        est = Estimator(cfg_i, dyn, grid_render, get_rays_fn,
                        body_state_to_camera_pose,
                        get_rays_at_fn=get_rays_at_fn,
                        march_fn=march_fn, render_frozen_fn=frozen_render)
        est.set_initial_state(x0)
        est.estimate_state(obs, pose, np.array([10.0, 0, 0, 0]))  # warm jit

        reps = 3
        timings = {}

        def t(name, fn):
            best = 1e9
            out = None
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best * 1e3, 1)
            return out

        img_f = t("img_to_f32_ms", lambda: obs.astype(np.float32) / 255.0)
        img_u8 = t("img_to_u8_ms",
                   lambda: (np.clip(img_f, 0, 1) * 255).astype(np.uint8))
        poi = t("sift_ms", lambda: find_poi(
            img_u8, backend=cfg_i.poi_backend,
            downscale=cfg_i.poi_downscale))
        mask = t("mask_ms", lambda: interest_region_mask(
            (H, W), poi, cfg_i.kernel_size, cfg_i.dilate_iter))
        flat = np.flatnonzero(mask.reshape(-1))
        pool = np.zeros(cfg_i.pool_size, np.int32)
        n_p = min(len(flat), cfg_i.pool_size)
        pool[:n_p] = flat[:n_p]
        if n_p < cfg_i.pool_size:
            pool[n_p:] = flat[np.arange(cfg_i.pool_size - n_p) % len(flat)]
        gt_pixels = jnp.asarray(img_f.reshape(-1, 3)[pool])
        rays_pool = jnp.asarray(pool)
        gn_fused = est._jit_cache[(H, W)][3]
        sub = jax.random.split(jax.random.PRNGKey(1))[0]

        def run_fused():
            out = gn_fused(est.xt, jnp.asarray([10.0, 0, 0, 0], jnp.float32),
                           jnp.asarray(est.sig, jnp.float32), rays_pool,
                           cfg_i.pool_size, gt_pixels, sub)
            jax.block_until_ready(out)
            return out

        t("gn_fused_dispatch_ms", run_fused)
        timings["gn_iters"] = cfg_i.gn_iters
        timings["jac_batch"] = cfg_i.gn_jac_batch
        print(json.dumps({"metric": "filter_breakdown", **timings}))

    if args.fused_cycle:
        import dataclasses

        from nerfnav_tpu.nav.fused import FusedMPC

        cfg_i = dataclasses.replace(ecfg, optimizer="gn")
        est = Estimator(cfg_i, dyn, dense_render, get_rays_fn,
                        body_state_to_camera_pose,
                        get_rays_at_fn=get_rays_at_fn)
        est.set_initial_state(x0)
        traj = Planner(s18, e18, pcfg, density_fn)
        fused = FusedMPC(est, traj, H, W, n_replan=args.replan_iters)
        hover = np.array([10.0, 0, 0, 0], np.float32)
        x, act = fused.step(obs, hover)      # warm the one-program tick
        np.asarray(act)
        est.set_initial_state(x0)
        est.sig = np.eye(12, dtype=np.float32) * cfg_i.sig0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            x, act = fused.step(obs, hover)
            np.asarray(act)                  # sync: the action the loop uses
        tick_s = (time.perf_counter() - t0) / reps
        pos_err = float(np.linalg.norm(np.asarray(x)[0:3] - x0[0:3]))
        print(json.dumps({
            "metric": "fused_tick_ms",
            "value": round(tick_s * 1e3, 1),
            "unit": f"ms (front-end + ONE program: {cfg_i.gn_iters} LM iters"
                    f" + pop + {args.replan_iters}-iter replan + action)",
            "fused_loop_hz": round(1.0 / tick_s, 2),
            "pos_drift_m": round(pos_err, 4),
            "front_end": fused.last_timings,
        }))

    paths = {"both": ["dense", "grid"],
             "all": ["dense", "grid", "frozen"]}.get(
        args.filter_render, [args.filter_render])
    opts = (["adam", "gn"] if args.filter_opt == "both" else [args.filter_opt])
    filt_s = None
    for path in paths:
        for optimizer in opts:
            if path == "frozen" and optimizer != "gn":
                continue  # frozen mode is GN-only
            render_fn = dense_render if path == "dense" else grid_render
            import dataclasses

            cfg_i = dataclasses.replace(ecfg, optimizer=optimizer)
            est = Estimator(cfg_i, dyn, render_fn, get_rays_fn,
                            body_state_to_camera_pose,
                            get_rays_at_fn=get_rays_at_fn,
                            march_fn=march_fn if path == "frozen" else None,
                            render_frozen_fn=(frozen_render
                                              if path == "frozen" else None))
            est.set_initial_state(x0)
            est.estimate_state(obs, pose, np.array([10.0, 0, 0, 0]))  # warm jit
            est.set_initial_state(x0)
            est.sig = np.eye(12, dtype=np.float32) * cfg_i.sig0
            t0 = time.perf_counter()
            state = est.estimate_state(obs, pose, np.array([10.0, 0, 0, 0]))
            dt_s = time.perf_counter() - t0
            # hover thrust (g=10): the true propagated position stays ~x0, so
            # a healthy filter stays put; drift flags a broken render path
            pos_err = float(np.linalg.norm(np.asarray(state)[0:3] - x0[0:3]))
            iters = (f"{cfg_i.gn_iters} LM iters" if optimizer == "gn"
                     else f"{cfg_i.n_iters} Adam iters")
            print(json.dumps({
                "metric": f"filter_update_ms_{path}_{optimizer}",
                "value": round(dt_s * 1e3, 1),
                "unit": f"ms ({iters} x 1024 rays)",
                "pos_drift_m": round(pos_err, 4),
                "sections": est.last_timings,
            }))
            if filt_s is None or dt_s < filt_s:
                filt_s = dt_s

    if replan_s is not None and filt_s is not None:
        print(json.dumps({
            "metric": "replan_loop_hz",
            "value": round(1.0 / (replan_s + filt_s), 3),
            "unit": "Hz (replan + fastest filter per MPC step)",
        }))


if __name__ == "__main__":
    main()
