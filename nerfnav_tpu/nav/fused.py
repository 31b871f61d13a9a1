"""One-program MPC cycle: filter update + waypoint pop + replan + action.

Capability parity: the reference's per-tick MPC loop is four
host-orchestrated torch stages with numpy glue between them —
`get_next_action` -> `estimate_state` -> `update_state` -> `learn_update`
(reference simulate.py:60-70, estimator_helpers.py:347-419 covariance
round-trips, quad_plot.py:279-308 replanning). Here everything after the
host feature front-end is ONE jitted XLA program per control tick: the
dynamics predict, covariance propagation + PD conditioning, the LM solve,
posterior covariance, divergence fallback (select, not a host branch), the
waypoint pop, a full replan `lax.scan` chunk, the differential-flatness
rollup, and the next action. The chip sees one dispatch per tick — the
north star's single fused plan-estimate-replan step.

Requires the static-horizon planner (the live waypoint count is a traced
argument there, so the popped horizon needs no retrace) and the GN/LM
estimator path (the Adam path re-inits optimizer state per measurement
batch and keeps a host Hessian step).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.nav.math_utils import vec_to_rot_matrix
from nerfnav_tpu.nav.planner import calc_everything


class FusedMPC:
    """Binds an `Estimator` (GN path) and a static-horizon `Planner` into
    the single-program cycle. Host state on both objects (xt/sig/iteration,
    states/initial_accel/active/start_state) is kept mirrored so the
    unfused methods (`get_full_states`, artifact dumps, open-loop tail)
    keep working mid-mission."""

    def __init__(self, filt, traj, H: int, W: int, n_replan: int | None = None):
        if not traj.cfg.static_horizon:
            raise ValueError("FusedMPC needs PlannerConfig.static_horizon "
                             "(the pop must be trace-friendly)")
        if filt.cfg.optimizer != "gn":
            raise ValueError("FusedMPC fuses the GN/LM filter path")
        if traj.workspace:
            raise ValueError("FusedMPC is the headless loop; per-epoch "
                             "artifact cadence needs the unfused Planner")
        self.filt = filt
        self.traj = traj
        self.H, self.W = H, W
        self.n_replan = int(n_replan or traj.cfg.epochs_update)

        key = (H, W)
        if key not in filt._jit_cache:
            filt._jit_cache[key] = filt._build_update(H, W)
        gn_fused = filt._jit_cache[key][3]
        if traj._step is None:
            traj._step = traj._build_step()
        chunk = traj._step
        cfg = traj.cfg
        opt_init = traj.opt.init
        n = self.n_replan

        @partial(jax.jit, static_argnums=(0,))
        def cycle(pop: bool, xt, action, sig, pool, pool_count, gt, rng,
                  states, initial_accel, end_state, active):
            # ---- filter update (inlines the estimator's fused program)
            x_pred, sig_pred_c, x, sig_post, losses = gn_fused(
                xt, action, sig, pool, pool_count, gt, rng)
            ok = jnp.all(jnp.isfinite(x)) & jnp.isfinite(losses[-1])
            # divergence fallback as a select — estimate_state's host
            # isfinite branch (reference estimator_helpers.py:185-190
            # degradation), without leaving the program
            x_used = jnp.where(ok, x, x_pred)
            sig_used = jnp.where(ok, sig_post, sig_pred_c)
            # ---- re-root + pop (Planner.update_state semantics)
            R = vec_to_rot_matrix(x_used[6:9])
            start = jnp.concatenate(
                [x_used[0:3], x_used[3:6], R.reshape(-1), x_used[9:12]])
            if pop:
                # vacated tail row is dead: index >= active hovers at goal
                states = jnp.roll(states, -1, axis=0)
            # ---- replan chunk (Planner._learn headless steady state:
            # fresh Adam state, fade clock from 0, one scan chunk)
            params = {"states": states, "initial_accel": initial_accel}
            params, _, plan_losses = chunk(
                params, opt_init(params), start, end_state, n,
                jnp.float32(0.0), active)
            # ---- next action (Planner.get_next_action rollup)
            out = calc_everything(start, end_state, params["states"],
                                  params["initial_accel"], cfg, active=active)
            return (x_used, sig_used, losses, start, params["states"],
                    params["initial_accel"], plan_losses, out["actions"][0])

        self._cycle = cycle

    def step(self, obs_img, action):
        """One control tick. Mirrors the unfused sequence
        [estimate_state -> update_state -> learn_update -> get_next_action]
        exactly (equivalence-tested); returns (x_est, next_action) as
        device arrays (np.asarray at the call-site syncs)."""
        filt, traj = self.filt, self.traj
        assert filt.xt is not None, "call set_initial_state first"
        _, _, rays_pool, gt_pixels, t_walls = filt._front_end(obs_img)
        if rays_pool is None:
            # rare no-features tick: prior fallback through the unfused path
            x_est = filt.estimate_state(obs_img, None, action)
            traj.update_state(x_est)
            traj.learn_update(filt.iteration)
            return x_est, traj.get_next_action()
        rng = jax.random.PRNGKey(filt.iteration)
        rng, sub = jax.random.split(rng)
        pop = traj.active > 1
        active_new = traj.active - 1 if pop else traj.active
        (x, sig, _losses, start, states, accel, plan_losses, action_next) = \
            self._cycle(bool(pop), filt.xt,
                        jnp.asarray(action, jnp.float32),
                        jnp.asarray(filt.sig, jnp.float32), rays_pool,
                        filt.cfg.pool_size, gt_pixels, sub,
                        traj.states, traj.initial_accel, traj.end_state,
                        jnp.int32(active_new))
        self.last_timings = t_walls
        # ---- mirror host state on both objects
        filt.xt = x
        filt.sig = np.asarray(sig)
        filt.iteration += 1
        traj.start_state = start
        traj.states = states
        traj.initial_accel = accel
        traj.active = active_new
        traj.epoch += self.n_replan
        self.last_plan_losses = plan_losses
        return x, action_next
