"""Training throughput benchmark on the current default device.

Measures jitted train-step rate at the reference workload shape
(4096 rays/step, full-size field, occupancy fast path, 800x800 images) on a
synthetic in-memory scene. Prints a JSON line.
"""

import json
import time

import numpy as np


from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main(num_rays=4096, steps=50, H=800, W=800, layout="cell",
         levels=16, level_dim=2, log2=None, shell=False, budget=True,
         grid_backward="xla", coarse_segments=16, coarse_anchors=3,
         table_dtype="float32", phase_a_group=0, fracs=None, scan_steps=1):
    """shell=True replaces the random-init occupancy with a converged-scene
    sphere shell (valid-sample fraction ~0.1 like a trained scene) — the
    regime where the point-budget packed shade pays; budget=False disables
    packing for the A/B."""
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout=layout,
                        grid_levels=levels, grid_level_dim=level_dim,
                        grid_log2_hashmap_size=(
                            log2 if log2 is not None
                            else 16 if layout == "cell" else 19
                        ),
                        grid_backward=grid_backward,
                        grid_table_dtype=table_dtype)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.2)
    okw = {} if fracs is None else {"point_budget_fracs": fracs}
    opt = TrainerOptions(name="bench", workspace="/tmp/nerfnav_train_bench",
                         num_rays=num_rays, use_checkpoint="scratch",
                         bg_train="random", point_budget=budget, **okw)
    occ = OccupancyConfig(bound=1.0)
    march = MarchConfig(bound=1.0, samples_per_ray=32,
                        coarse_segments=coarse_segments,
                        coarse_anchors=coarse_anchors,
                        phase_a_group=phase_a_group)
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ, march_cfg=march)

    rng = np.random.default_rng(0)
    n_img = 4
    arrays = {
        "poses": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32)[None], (n_img, 1, 1))
        ).at[:, 2, 3].set(-1.8),
        "images": jnp.asarray(rng.random((n_img, H, W, 4)), jnp.float32),
        "intrinsics": jnp.asarray([1000.0, 1000.0, W / 2, H / 2]),
    }
    tr.state = tr._init_state(n_img)
    if shell:
        from nerfnav_tpu.models.occupancy import _finish_update

        Hg = march.grid_size
        ii = np.arange(Hg**3)
        c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) / Hg * 2 - 1
        r = np.linalg.norm(c, axis=-1)
        dens = jnp.asarray(
            np.where((r > 0.3) & (r < 0.45), 50.0, 0.0)[None], jnp.float32
        )
        tr.state = tr.state._replace(occupancy=_finish_update(
            tr.state.occupancy, occ, dens, jnp.full_like(dens, -1.0), None))
    else:
        # seed the occupancy grid once (not timed; amortized 1/16 in practice)
        tr._maybe_update_occupancy()

    key = jax.random.PRNGKey(0)
    state = tr.state
    # one warmup step feeds the mean-count EMA, then rebuild with the
    # budgeted program (the trainer's every-16-step cadence, compressed)
    step_fn = tr._step_fn(H, W, 4)
    state, loss = step_fn(state, arrays, jnp.asarray(0), key)  # compile
    loss.block_until_ready()
    tr.state = state
    if state.mean_count is not None:
        tr._mean_count_host = float(state.mean_count)
    step_fn = tr._step_fn(H, W, 4)
    if scan_steps > 1:
        base_fn = step_fn

        @jax.jit
        def step_fn_scan(state, arrays, idxs, keys):
            def body(st, xk):
                st, loss = base_fn(st, arrays, xk[0], xk[1])
                return st, loss

            return jax.lax.scan(body, state, (idxs, keys))

        idxs0 = jnp.arange(scan_steps, dtype=jnp.int32) % n_img
        keys0 = jax.random.split(key, scan_steps)
        state, losses = step_fn_scan(state, arrays, idxs0, keys0)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        for s in range(0, steps, scan_steps):
            key, sub = jax.random.split(key)
            idxs = (s + jnp.arange(scan_steps, dtype=jnp.int32)) % n_img
            state, losses = step_fn_scan(state, arrays, idxs,
                                         jax.random.split(sub, scan_steps))
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / (steps - steps % scan_steps
                                           if steps % scan_steps else steps)
        loss = losses[-1]
    else:
        state, loss = step_fn(state, arrays, jnp.asarray(1), key)  # compile budgeted
        loss.block_until_ready()
        t0 = time.perf_counter()
        for s in range(steps):
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, arrays, jnp.asarray(s % n_img), sub)
        loss.block_until_ready()
        dt = (time.perf_counter() - t0) / steps
    # occupancy maintenance cost (Trainer.train runs update_extra_state
    # every update_extra_interval=16 steps; the timed loop above is
    # step-only). A partial sweep queries n_cells/4 uniform + n_cells/4
    # occupied cells per cascade — ~1M density queries at 128^3.
    from nerfnav_tpu.models.occupancy import update_extra_state

    tr.state = state
    st_occ = state.occupancy
    st_occ = dict(st_occ, iter_density=jnp.asarray(99, jnp.int32))  # partial
    upd = None
    occ_best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        upd = update_extra_state(st_occ, occ, state.params, cfg,
                                 jax.random.PRNGKey(rep))
        jax.block_until_ready(upd["density_grid"])
        occ_best = min(occ_best, time.perf_counter() - t0)
    occ_ms = occ_best * 1e3
    interval = 16
    real_dt = dt + occ_best / interval
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(1.0 / dt, 2),
        "unit": "steps/s",
        "rays_per_step": num_rays,
        "train_rays_per_sec": round(num_rays / dt),
        "grid": f"{layout} {levels}x{level_dim}",
        "shell": shell,
        "sample_budget": tr._current_budget(),
        "occ_update_ms": round(occ_ms, 2),
        "steps_per_sec_with_occ": round(1.0 / real_dt, 2),
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--num_rays", type=int, default=4096)
    ap.add_argument("--layout", default="cell")
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--level_dim", type=int, default=2)
    ap.add_argument("--log2", type=int, default=None)
    ap.add_argument("--shell", action="store_true")
    ap.add_argument("--no_budget", action="store_true")
    ap.add_argument("--grid_backward", default="xla", choices=["xla", "sort"])
    ap.add_argument("--coarse_segments", type=int, default=16,
                    help="march trim: phase-A segment budget (training keeps "
                         "16 by default; the render flagship uses 12)")
    ap.add_argument("--coarse_anchors", type=int, default=3)
    ap.add_argument("--table_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bf16 table gathers/scatters (fp32 masters)")
    ap.add_argument("--g_a", type=int, default=0,
                    help="phase-A anchor-run override (MarchConfig"
                         ".phase_a_group; 0 = auto incl. the runs>=8 cap)")
    ap.add_argument("--fracs", default=None,
                    help="comma list overriding point_budget_fracs (e.g. "
                         "0.0625,0.125,0.25): a lower floor shrinks the "
                         "packed-shade budget; overflow drops samples, the "
                         "reference's own mean_count semantics "
                         "(raymarching.py:198-203)")
    ap.add_argument("--scan_steps", type=int, default=1,
                    help="steps fused per dispatch via lax.scan (amortizes "
                         "the relay dispatch floor; the trainer's occupancy "
                         "cadence allows up to update_extra_interval=16)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke run (never for recorded numbers)")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    fracs = (tuple(float(x) for x in a.fracs.split(","))
             if a.fracs else None)
    main(num_rays=a.num_rays, steps=a.steps, H=a.hw, W=a.hw, layout=a.layout,
         levels=a.levels, level_dim=a.level_dim, log2=a.log2, shell=a.shell,
         budget=not a.no_budget, grid_backward=a.grid_backward,
         coarse_segments=a.coarse_segments, coarse_anchors=a.coarse_anchors,
         table_dtype=a.table_dtype, phase_a_group=a.g_a,
         fracs=fracs, scan_steps=a.scan_steps)
