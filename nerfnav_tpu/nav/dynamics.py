"""Quadrotor rigid-body dynamics.

Capability parity: reference nav/agent_helpers.py:124-171 (`drone_dynamics`:
12-dim state [pos, vel, rotvec, omega], thrust/gravity translational accel,
rotation update by exponential map, Euler rotational dynamics
omega_dot = J^-1 (tau - omega x J omega)) and nav/quad_helpers.py:8-106
(`Simulator`: standalone 18-dim open-loop stepper) + `next_rotation`
Rodrigues update (186-199).

Pure jnp: the estimator takes jacfwd of `drone_dynamics` w.r.t. the state
(estimator_helpers.py:355-362), which this supports natively.
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.nav.math_utils import rot_matrix_to_vec, vec_to_rot_matrix


@dataclass(frozen=True)
class DynamicsConfig:
    mass: float = 1.0
    g: float = 10.0                      # reference uses g = 10
    inertia: tuple = (0.01, 0.01, 0.02)  # diagonal J
    dt: float = 0.1


def drone_dynamics(state, action, cfg: DynamicsConfig):
    """One Euler step. state: (12,) [pos, vel, rotvec, omega];
    action: (4,) [thrust, tau_x, tau_y, tau_z]. Returns next (12,) state."""
    pos, vel, rv, omega = state[0:3], state[3:6], state[6:9], state[9:12]
    thrust, torque = action[0], action[1:]
    R = vec_to_rot_matrix(rv)
    J = jnp.diag(jnp.asarray(cfg.inertia))
    e3 = jnp.array([0.0, 0.0, 1.0])

    accel = (thrust / cfg.mass) * (R @ e3) - cfg.g * e3
    next_pos = pos + vel * cfg.dt
    next_vel = vel + accel * cfg.dt
    next_R = R @ vec_to_rot_matrix(omega * cfg.dt)
    omega_dot = jnp.linalg.solve(J, torque - jnp.cross(omega, J @ omega))
    next_omega = omega + omega_dot * cfg.dt
    return jnp.concatenate([next_pos, next_vel, rot_matrix_to_vec(next_R), next_omega])


def next_rotation(R, omega, dt):
    """R_{t+1} = R_t exp(skew(omega) dt) (reference quad_helpers.py:186-199)."""
    return R @ vec_to_rot_matrix(omega * dt)


class Simulator:
    """Open-loop 18-dim rollout container (reference quad_helpers.py:8-106):
    state [pos(3), vel(3), R(9), omega(3)], advanced by actions."""

    def __init__(self, start_state, cfg: DynamicsConfig = DynamicsConfig()):
        self.cfg = cfg
        self.states = [np.asarray(start_state, np.float32)]

    @property
    def state(self):
        return self.states[-1]

    def advance(self, action):
        s = self.states[-1]
        pos, vel = s[0:3], s[3:6]
        R = s[6:15].reshape(3, 3)
        omega = s[15:18]
        rv = np.asarray(rot_matrix_to_vec(jnp.asarray(R)))
        x12 = np.concatenate([pos, vel, rv, omega]).astype(np.float32)
        nxt = np.asarray(
            drone_dynamics(jnp.asarray(x12), jnp.asarray(action, jnp.float32), self.cfg)
        )
        R_next = np.asarray(vec_to_rot_matrix(jnp.asarray(nxt[6:9])))
        s18 = np.concatenate([nxt[0:3], nxt[3:6], R_next.reshape(-1), nxt[9:12]])
        self.states.append(s18.astype(np.float32))
        return s18

    def body_to_world(self, points):
        """(N, 3) body points -> world at the current state."""
        s = self.states[-1]
        R = s[6:15].reshape(3, 3)
        return points @ R.T + s[0:3]
