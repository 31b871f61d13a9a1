"""Trajectory planner: A*-seeded differential-flatness optimization through
the NeRF density field.

Capability parity: reference nav/quad_plot.py (`Planner`, 11-543):
  * decision variables: interior waypoint states [pos, yaw] (36-41) +
    `initial_accel` (2,) tying the first two steps to the start state (42)
  * `a_star_init` (64-115): 100^3 density sample -> maxpool -> 20^3
    occupancy > 0.3 -> 6-connected A* -> waypoint interpolation
  * `calc_everything` (120-198): full differential-flatness rollup — body z
    from required accel, x from yaw heading, omega from the SO(3) log of
    R_t^T R_{t+1} / dt, torques J @ alpha (+ gyroscopic term), thrust
    m * |accel - g_vec|
  * cost (224-250): control effort (thrust^2, ||tau||^4) + density-weighted
    collision risk of a 10x10x5 body point cloud swept along the trajectory,
    with optional progressive fade-in mask (243-247)
  * `learn_init` 2500 / `learn_update` 250 Adam epochs (256-300), MPC
    `update_state` re-rooting (302-308), JSON pose/cost dumps every 50
    epochs (344-369), `save_progress` (371-384)

TPU-native design: `calc_everything` and the cost are pure jnp; one jitted
optax Adam step drives both learn loops (the NeRF density gradient flows
through body_to_world into the waypoints); A* stays host-side (runs once).
The planner consumes a `density_fn` closure — injectable analytic fields make
it testable without a trained model (reference quad_plot.py:442-443).
"""

import json
import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfnav_tpu.nav.astar import astar
from nerfnav_tpu.nav.math_utils import rot_matrix_to_vec, vec_to_rot_matrix
from nerfnav_tpu.nav.dynamics import next_rotation


@dataclass(frozen=True)
class PlannerConfig:
    T: int = 20                      # steps in the horizon (simulate.py:308)
    dt: float = 0.1                  # T_total = 2 s over 20 steps
    mass: float = 1.0
    g: float = 10.0
    inertia: tuple = (0.01, 0.01, 0.02)
    body_extent: tuple = ((-0.05, 0.05), (-0.05, 0.05), (-0.02, 0.02))
    body_nbins: tuple = (10, 10, 5)  # 10x10x5 cloud (simulate.py:304-306)
    lr: float = 1e-3
    epochs_init: int = 2500
    epochs_update: int = 250
    fade_out_epoch: int = 0
    fade_out_sharpness: float = 10.0
    bound: float = 1.0               # planning volume [-bound, bound]^3
    astar_fine: int = 100            # density sample resolution (quad_plot.py:64)
    astar_coarse: int = 20           # after maxpool (quad_plot.py:70)
    astar_thresh: float = 0.3
    # cost weights (quad_plot.py:224-250)
    w_thrust: float = 1000.0 / 1e6
    w_torque: float = 0.01 / 1e6
    w_collision: float = 1.0         # density * speed term (1e6 / 1e6)
    save_every: int = 50
    # MPC re-rooting mode: True keeps every array at T_max and passes a traced
    # `active` waypoint count (one compiled replan program for the whole
    # mission); False reproduces the reference's pop-and-shrink (one recompile
    # per MPC step, reference quad_plot.py:302-308)
    static_horizon: bool = True


def _safe_norm(v, axis=-1, keepdims=False, eps=1e-12):
    """Norm with finite gradient at 0 (jnp.linalg.norm's grad is NaN there —
    the trajectory starts and ends at exactly zero velocity)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + eps)


def body_points(cfg: PlannerConfig) -> jnp.ndarray:
    """The robot body point cloud (B, 3) in body frame."""
    axes = [
        np.linspace(lo, hi, n)
        for (lo, hi), n in zip(cfg.body_extent, cfg.body_nbins)
    ]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    return jnp.asarray(grid, jnp.float32)


def calc_everything(start_state, end_state, states, initial_accel, cfg: PlannerConfig,
                    active=None):
    """Differential flatness: waypoints [pos, yaw] -> full rigid-body states.

    start_state/end_state: (18,) [pos, vel, R.flatten(), omega];
    states: (T, 4); initial_accel: (2,).
    Returns dict with shapes:
      pos (T+5, 3), vel (T+5, 3), accel (T+4, 3), rot (T+4, 3, 3),
      omega (T+3, 3), actions (T+2, 4) [thrust, tau_xyz].

    active: optional traced waypoint count for the STATIC-HORIZON mode: the
    first `active` rows of `states` are live decision variables, the goal sits
    at sequence index 4+active, and every later slot pads out as hover-at-goal
    (pos = end_pos, vel = end_v). The reference re-roots its MPC by popping a
    waypoint and shrinking T (quad_plot.py:302-308) — under XLA that is one
    recompile per MPC step; passing a traced `active` keeps every shape at
    T_max so the whole mission reuses ONE compiled replan program. With
    active == T (or None) the outputs equal the legacy dynamic-shape path on
    the full sequence.
    """
    dt, g, m = cfg.dt, cfg.g, cfg.mass
    e3 = jnp.array([0.0, 0.0, 1.0])
    g_vec = -g * e3

    start_pos, start_v = start_state[0:3], start_state[3:6]
    start_R = start_state[6:15].reshape(3, 3)
    start_omega = start_state[15:18]
    end_pos, end_v = end_state[0:3], end_state[3:6]

    # rotation at t=1 follows from start attitude + body rates
    R1 = next_rotation(start_R, start_omega, dt)
    # the first two accelerations act along the (known) body z axes of R0/R1
    # with the free magnitudes initial_accel — this pins pos/vel/R continuity
    # at the start (reference quad_plot.py:127-143). All derived quantities
    # below are DEFINED by finite differences (the flatness parametrization),
    # so the first three positions are chosen such that
    #   vel_fd[0] = start_v, accel_fd[0] = a0, accel_fd[1] = a1.
    a0 = (start_R @ e3) * initial_accel[0] + g_vec
    a1 = (R1 @ e3) * initial_accel[1] + g_vec
    p0 = start_pos
    p1 = p0 + start_v * dt
    p2 = p1 + (start_v + a0 * dt) * dt
    p3 = p2 + (start_v + (a0 + a1) * dt) * dt

    if active is None:
        wpos = states[:, :3]
        wyaw = states[:, 3]
    else:
        a = jnp.asarray(active, jnp.int32)
        w_mask = jnp.arange(states.shape[0]) < a
        wpos = jnp.where(w_mask[:, None], states[:, :3], end_pos[None])
        wyaw = jnp.where(w_mask, states[:, 3], 0.0)

    pos = jnp.concatenate(
        [jnp.stack([p0, p1, p2, p3]), wpos, end_pos[None]], axis=0
    )  # (T+5, 3)

    vel_fd = jnp.concatenate(
        [(pos[1:] - pos[:-1]) / dt, end_v[None]], axis=0
    )  # (T+5, 3): last entry is the terminal velocity constraint
    if active is None:
        vel = vel_fd
    else:
        # the terminal-velocity constraint moves to the arrival step 4+active;
        # the hover-at-goal pad keeps vel = end_v so pad accelerations vanish
        seq = jnp.arange(vel_fd.shape[0])
        vel = jnp.where((seq < 4 + a)[:, None], vel_fd, end_v[None])

    accel = (vel[1:] - vel[:-1]) / dt  # (T+4, 3)
    needed = accel - g_vec[None]       # thrust vector = accel + g e3 (T+4, 3)
    thrust = m * _safe_norm(needed, axis=-1)  # (T+4,)

    # attitude: z from thrust direction, x from yaw heading
    z_b = needed / _safe_norm(needed, axis=-1, keepdims=True, eps=1e-8)
    yaw = jnp.concatenate(
        [jnp.zeros((3,)), wyaw, jnp.zeros((1,))], axis=0
    )  # (T+4,): indices 0-2 are start-derived steps, last is the endpoint
    heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], axis=-1)
    y_b = jnp.cross(z_b, heading)
    y_b = y_b / _safe_norm(y_b, axis=-1, keepdims=True, eps=1e-8)
    x_b = jnp.cross(y_b, z_b)
    rot = jnp.stack([x_b, y_b, z_b], axis=-1)  # (T+4, 3, 3)
    # pin the first two attitudes to the start-consistent ones
    rot = rot.at[0].set(start_R).at[1].set(R1)

    # body rates from relative rotations (reference quad_plot.py:166-176)
    rel = jnp.einsum("sij,sik->sjk", rot[:-1], rot[1:])  # R_t^T R_{t+1}
    omega = rot_matrix_to_vec(rel) / dt                  # (T+3, 3)

    alpha = (omega[1:] - omega[:-1]) / dt                # (T+2, 3)
    J = jnp.diag(jnp.asarray(cfg.inertia))
    torques = alpha @ J.T + jnp.cross(omega[:-1], omega[:-1] @ J.T)  # (T+2, 3)
    actions = jnp.concatenate(
        [thrust[: torques.shape[0], None], torques], axis=-1
    )  # (T+2, 4): action t applies over [t, t+1]

    return {
        "pos": pos,
        "vel": vel,
        "accel": accel,
        "rot": rot,
        "omega": omega,
        "actions": actions,
    }


def total_cost(
    start_state, end_state, states, initial_accel, density_fn, cfg: PlannerConfig,
    body: jnp.ndarray, fade_mask=None, active=None,
):
    """reference quad_plot.py:224-250.

    active: static-horizon waypoint count (see calc_everything) — cost terms
    past the arrival step are masked out and the mean renormalizes to the
    active step count, so the loss equals the legacy dynamic-shape loss."""
    out = calc_everything(start_state, end_state, states, initial_accel, cfg,
                          active=active)
    # thrust over ALL T+4 intervals: the last two intervals have no torque
    # (the differentiation chain ends) but MUST still carry a thrust penalty,
    # otherwise the optimizer parks unbounded accelerations in the
    # uncontrolled tail right before the goal.
    fz_all = cfg.mass * _safe_norm(
        out["accel"] - jnp.array([0.0, 0.0, -cfg.g]), axis=-1
    )  # (T+4,)
    torque2 = jnp.sum(out["actions"][:, 1:] ** 2, axis=-1)  # (T+2,)
    s_all = fz_all.shape[0]
    if active is not None:
        # torque rows past the active chain are pad-boundary artifacts
        # (hover-at-goal transition); zero them before they enter the sum
        t_live = jnp.arange(torque2.shape[0]) < jnp.asarray(active) + 2
        torque2 = jnp.where(t_live, torque2, 0.0)
    control = cfg.w_thrust * fz_all**2
    control = control.at[: torque2.shape[0]].add(cfg.w_torque * torque2**2)

    # sweep the body cloud through the field: (S, B, 3)
    S = out["rot"].shape[0]
    world = (
        jnp.einsum("sij,bj->sbi", out["rot"], body) + out["pos"][:S, None, :]
    )
    sigma = density_fn(world.reshape(-1, 3)).reshape(S, -1)  # (S, B)
    speed = _safe_norm(out["vel"][:S], axis=-1)               # (S,)
    collision = cfg.w_collision * jnp.mean(sigma, axis=-1) * speed  # (S,)

    per_step = control + collision[:s_all]
    if fade_mask is not None:
        per_step = per_step * fade_mask[: per_step.shape[0]]
    if active is None:
        return jnp.mean(per_step), out
    a = jnp.asarray(active, jnp.int32)
    live = (jnp.arange(s_all) < a + 4).astype(per_step.dtype)
    return jnp.sum(per_step * live) / (a + 4), out


class Planner:
    def __init__(
        self,
        start_state,
        end_state,
        cfg: PlannerConfig,
        density_fn,
        workspace: str | None = None,
        exp_name: str = "plan",
    ):
        self.cfg = cfg
        self.density_fn = density_fn
        self.start_state = jnp.asarray(start_state, jnp.float32)
        self.end_state = jnp.asarray(end_state, jnp.float32)
        self.body = body_points(cfg)
        self.workspace = workspace
        self.exp_name = exp_name
        if workspace:
            for sub in ("init_poses", "init_costs", "replan_poses", "replan_costs"):
                os.makedirs(os.path.join(workspace, sub, exp_name), exist_ok=True)

        # straight-line init of the decision waypoints (overridden by A*)
        alphas = jnp.linspace(0, 1, cfg.T + 2)[1:-1, None]
        pos = self.start_state[None, 0:3] * (1 - alphas) + self.end_state[None, 0:3] * alphas
        self.states = jnp.concatenate([pos, jnp.zeros((cfg.T, 1))], axis=-1)
        self.initial_accel = jnp.asarray([cfg.g, cfg.g], jnp.float32)

        # clipped Adam: the torque^4 term can spike steeply when the attitude
        # kinks mid-optimization; clipping keeps the solve from detonating
        self.opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(cfg.lr))
        self._step = None
        self.epoch = 0
        # live waypoint count for the static-horizon MPC mode; always tracked
        # host-side (it equals cfg.T until update_state starts popping)
        self.active = cfg.T

    def _active_arg(self):
        """`active` to thread into planner math: None in legacy mode (arrays
        already carry exactly the live horizon)."""
        return self.active if self.cfg.static_horizon else None

    # ----------------------------------------------------------------- A*
    def a_star_init(self):
        """reference quad_plot.py:64-115."""
        cfg = self.cfg
        n, c = cfg.astar_fine, cfg.astar_coarse
        lin = np.linspace(-cfg.bound, cfg.bound, n)
        grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
        sigma = np.asarray(self.density_fn(jnp.asarray(grid, jnp.float32))).reshape(
            n, n, n
        )
        k = n // c
        coarse = sigma.reshape(c, k, c, k, c, k).max(axis=(1, 3, 5))  # maxpool
        occupied = coarse > cfg.astar_thresh

        def to_cell(p):
            cell = ((np.asarray(p) + cfg.bound) / (2 * cfg.bound) * c).astype(int)
            return tuple(np.clip(cell, 0, c - 1))

        def to_world(cell):
            return (np.asarray(cell) + 0.5) / c * 2 * cfg.bound - cfg.bound

        start = to_cell(self.start_state[0:3])
        goal = to_cell(self.end_state[0:3])
        # clear the endpoint cells (the robot is there by definition)
        occupied[start] = False
        occupied[goal] = False
        path = astar(occupied, start, goal)
        if path is None:
            raise RuntimeError("A* found no path between start and goal")
        pts = np.stack([to_world(cl) for cl in path])  # (P, 3)
        # resample to T interior waypoints
        dists = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=-1))])
        total = max(dists[-1], 1e-6)
        targets = np.linspace(0, total, self.cfg.T + 2)[1:-1]
        wp = np.stack([np.interp(targets, dists, pts[:, i]) for i in range(3)], -1)
        self.states = jnp.concatenate(
            [jnp.asarray(wp, jnp.float32), jnp.zeros((self.cfg.T, 1))], axis=-1
        )
        return path

    # ------------------------------------------------------------ learning
    def _build_step(self):
        """One jitted CHUNK of optimization epochs (lax.scan): per-iteration
        host dispatch dominated the solve time (~35 ms/iter overhead vs <1 ms
        compute); scanning save_every epochs per dispatch removes it while
        keeping the reference's per-50-epoch artifact cadence
        (quad_plot.py:344-369)."""
        cfg, density_fn, body = self.cfg, self.density_fn, self.body

        def fade_for(ep, live_t):
            """Progressive collision fade-in front (quad_plot.py:243-247).
            live_t = live step count (active+4): the front must sweep the
            LIVE horizon, not T_max, or the static mode fades in more rows
            per epoch than the legacy shrunk-array computation."""
            t = cfg.T + 4
            if cfg.fade_out_epoch > 0:
                progress = jnp.minimum(ep / cfg.fade_out_epoch, 1.0) * live_t
                return jax.nn.sigmoid(
                    (progress - jnp.arange(t)) * cfg.fade_out_sharpness
                )
            return jnp.ones((t,))

        use_active = cfg.static_horizon

        @partial(jax.jit, static_argnums=(4,))
        def chunk(params, opt_state, start_state, end_state, n, ep0, active):
            def scan_body(carry, ep):
                params, opt_state = carry

                live_t = (active + 4) if use_active else (cfg.T + 4)

                def loss_fn(p):
                    loss, _ = total_cost(
                        start_state, end_state, p["states"], p["initial_accel"],
                        density_fn, cfg, body, fade_for(ep, live_t),
                        active=active if use_active else None,
                    )
                    return loss

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                scan_body, (params, opt_state), ep0 + jnp.arange(n)
            )
            return params, opt_state, losses

        return chunk

    def _learn(self, epochs: int, tag: str):
        if self._step is None:
            self._step = self._build_step()
        params = {"states": self.states, "initial_accel": self.initial_accel}
        opt_state = self.opt.init(params)
        losses = []
        # artifact cadence only matters with a workspace; headless solves
        # (the MPC loop's steady state) run ONE scan chunk — the per-chunk
        # dispatch + losses sync was ~2/3 of the 100-iter replan's fixed cost
        chunk = (max(1, min(self.cfg.save_every, epochs)) if self.workspace
                 else epochs)
        try:
            ep = 0
            while ep < epochs:
                # first chunk is a single epoch so artifacts land on the
                # reference's 0, save_every, 2*save_every... cadence
                n = (1 if ep == 0 and self.workspace
                     else min(chunk, epochs - ep))
                params, opt_state, chunk_losses = self._step(
                    params, opt_state, self.start_state, self.end_state,
                    n, jnp.float32(ep), jnp.int32(self.active),
                )
                losses.extend(np.asarray(chunk_losses, np.float64).tolist())
                ep += n
                self.epoch += n
                if self.workspace:
                    self._save_artifacts(tag, ep - 1, params, losses[-1])
        except KeyboardInterrupt:
            # graceful early stop keeps the current solution
            # (reference quad_plot.py:276-277)
            pass
        self.states = params["states"]
        self.initial_accel = params["initial_accel"]
        return losses

    def learn_init(self):
        """2500-epoch initial solve (reference quad_plot.py:256-277)."""
        return self._learn(self.cfg.epochs_init, "init")

    def learn_update(self, iteration: int = 0):
        """250-epoch replan (reference quad_plot.py:279-300)."""
        return self._learn(self.cfg.epochs_update, f"replan_{iteration}")

    # ----------------------------------------------------------------- MPC
    def update_state(self, est_state):
        """Re-root at a state estimate, pop the reached waypoint
        (reference quad_plot.py:302-308)."""
        est_state = jnp.asarray(est_state, jnp.float32)
        if est_state.shape[0] == 12:
            R = vec_to_rot_matrix(est_state[6:9])
            est_state = jnp.concatenate(
                [est_state[0:3], est_state[3:6], R.reshape(-1), est_state[9:12]]
            )
        self.start_state = est_state
        if self.cfg.static_horizon:
            if self.active > 1:
                # shift the live waypoints left; the vacated tail row is dead
                # (index >= active masks to hover-at-goal inside the math)
                self.states = jnp.roll(self.states, -1, axis=0)
                self.active -= 1
            # self._step stays valid: active is a traced argument
        elif self.states.shape[0] > 1:
            import dataclasses

            self.states = self.states[1:]
            self.cfg = dataclasses.replace(self.cfg, T=self.cfg.T - 1)
            self._step = None  # retrace for the shorter horizon

    def get_next_action(self):
        out = calc_everything(
            self.start_state, self.end_state, self.states, self.initial_accel,
            self.cfg, active=self._active_arg(),
        )
        return out["actions"][0]

    def get_full_states(self):
        """Full differential-flatness rollup; in static-horizon mode the
        padded tail rows are trimmed so callers see exactly the live
        trajectory (same shapes as legacy mode)."""
        out = calc_everything(
            self.start_state, self.end_state, self.states, self.initial_accel,
            self.cfg, active=self._active_arg(),
        )
        if self.cfg.static_horizon and self.active < self.cfg.T:
            out = self._trim(out)
        return out

    def _trim(self, out):
        """Cut hover-at-goal pad rows: live lengths are pos a+5, vel a+5,
        accel/rot a+4, omega a+3, actions a+2 (a = active waypoints)."""
        a = self.active
        keep = {"pos": a + 5, "vel": a + 5, "accel": a + 4, "rot": a + 4,
                "omega": a + 3, "actions": a + 2}
        return {k: (v[: keep[k]] if k in keep else v) for k, v in out.items()}

    # ------------------------------------------------------------ artifacts
    def _save_artifacts(self, tag, ep, params, loss):
        """JSON pose/cost dumps (reference quad_plot.py:344-369)."""
        out = calc_everything(
            self.start_state, self.end_state, params["states"],
            params["initial_accel"], self.cfg, active=self._active_arg(),
        )
        if self.cfg.static_horizon and self.active < self.cfg.T:
            out = self._trim(out)
        kind = "init" if tag == "init" else "replan"
        pose_dir = os.path.join(self.workspace, f"{kind}_poses", self.exp_name)
        cost_dir = os.path.join(self.workspace, f"{kind}_costs", self.exp_name)
        poses = np.concatenate(
            [
                np.asarray(out["rot"]),
                np.asarray(out["pos"][: out["rot"].shape[0]])[:, :, None],
            ],
            axis=-1,
        ).tolist()
        with open(os.path.join(pose_dir, f"{tag}_{ep}.json"), "w") as f:
            json.dump({"poses": poses}, f)
        with open(os.path.join(cost_dir, f"{tag}_{ep}.json"), "w") as f:
            json.dump({"loss": loss}, f)

    def save_progress(self, path):
        """reference quad_plot.py:371-384."""
        np.savez(
            path,
            states=np.asarray(self.states),
            initial_accel=np.asarray(self.initial_accel),
            start_state=np.asarray(self.start_state),
            end_state=np.asarray(self.end_state),
            active=np.asarray(self.active),
        )

    def load_progress(self, path):
        """Restore a save_progress file, reconciling horizon modes: a
        static-horizon file carries dead rolled-out tail rows past `active`
        that a legacy planner must NOT treat as live waypoints, and a legacy
        (shrunk) file must be padded back to T_max for a static planner."""
        data = np.load(path)
        states = jnp.asarray(data["states"])
        active = int(data["active"]) if "active" in data else states.shape[0]
        active = min(active, states.shape[0])
        self.initial_accel = jnp.asarray(data["initial_accel"])
        self.start_state = jnp.asarray(data["start_state"])
        self.end_state = jnp.asarray(data["end_state"])
        if self.cfg.static_horizon:
            T = self.cfg.T
            if active > T:
                raise ValueError(
                    f"progress file has {active} live waypoints but this "
                    f"planner's static horizon is T={T}; construct the "
                    f"Planner with cfg.T >= {active} to load it")
            if states.shape[0] > T:
                states = states[:T]  # dead static-file tail rows
            elif states.shape[0] < T:  # legacy file: pad dead (masked) rows
                pad = jnp.tile(states[-1:], (T - states.shape[0], 1))
                states = jnp.concatenate([states, pad], axis=0)
            self.states = states
            self.active = active
        else:
            states = states[:active]  # drop dead static-file tail rows
            if states.shape[0] != self.cfg.T:
                import dataclasses

                self.cfg = dataclasses.replace(self.cfg, T=states.shape[0])
                self._step = None  # horizon changed: retrace
            self.states = states
            self.active = states.shape[0]
