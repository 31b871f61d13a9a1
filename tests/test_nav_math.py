import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.nav.math_utils import (
    skew_matrix,
    vec_to_rot_matrix,
    rot_matrix_to_vec,
    rot_x,
    mahalanobis,
    nearest_pd,
    is_pd,
    calc_se3_err,
)
from nerfnav_tpu.nav.dynamics import DynamicsConfig, drone_dynamics, Simulator


class TestSO3:
    def test_skew(self):
        v = jnp.array([1.0, 2.0, 3.0])
        S = np.asarray(skew_matrix(v))
        w = np.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(S @ w, np.cross([1, 2, 3], w), atol=1e-6)
        np.testing.assert_allclose(S, -S.T)

    def test_rodrigues_known(self):
        # pi/2 about z: x -> y
        v = jnp.array([0.0, 0.0, np.pi / 2])
        R = np.asarray(vec_to_rot_matrix(v))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    def test_log_exp_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            v = rng.normal(size=3)
            v = v / np.linalg.norm(v) * rng.uniform(0.01, 3.0)
            R = vec_to_rot_matrix(jnp.asarray(v, jnp.float32))
            back = np.asarray(rot_matrix_to_vec(R))
            np.testing.assert_allclose(back, v, atol=1e-4)

    def test_small_angle_stable(self):
        v = jnp.array([1e-9, 0.0, 0.0])
        R = vec_to_rot_matrix(v)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        g = jax.jacobian(lambda x: rot_matrix_to_vec(vec_to_rot_matrix(x)))(
            jnp.zeros(3)
        )
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), np.eye(3), atol=1e-3)

    def test_log_near_pi_stable(self):
        # regression: the theta/(2 sin theta) form is 0/0 at theta = pi;
        # before the sym-matrix branch, fp noise in R - R^T blew up into
        # ~1e5-magnitude vectors (planner omega ~1e6 rad/s -> inf torque^4
        # cost -> NaN solve in examples/quickstart.py stage 5)
        rng = np.random.default_rng(1)
        for theta in [3.0, np.pi]:  # generic-branch edge + the exact pole
            ax = rng.normal(size=(4, 3))
            ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
            v = jnp.asarray(ax * theta, jnp.float32)
            R = vec_to_rot_matrix(v)
            back = rot_matrix_to_vec(R)
            # axis sign is ambiguous at pi: compare the rotations
            R2 = vec_to_rot_matrix(back)
            assert float(jnp.abs(jnp.linalg.norm(back, axis=-1) - theta).max()) < 1e-3
            assert float(jnp.abs(R - R2).max()) < 1e-3
            g = jax.grad(lambda M: jnp.sum(rot_matrix_to_vec(M) ** 2))(R)
            assert bool(jnp.isfinite(g).all())

    def test_identity_log_is_zero(self):
        np.testing.assert_allclose(
            np.asarray(rot_matrix_to_vec(jnp.eye(3))), np.zeros(3), atol=1e-6
        )

    def test_rot_x(self):
        R = np.asarray(rot_x(jnp.pi / 2))
        np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-6)


class TestStats:
    def test_mahalanobis(self):
        x = jnp.array([1.0, 2.0])
        mu = jnp.zeros(2)
        sigma = jnp.eye(2) * 4.0
        np.testing.assert_allclose(float(mahalanobis(x, mu, sigma)), 5.0 / 4.0, atol=1e-5)

    def test_nearest_pd(self):
        A = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
        assert not is_pd(A)
        P = nearest_pd(A)
        assert is_pd(P)

    def test_se3_err(self):
        p1 = np.eye(4)
        p2 = np.eye(4)
        p2[:3, :3] = np.asarray(vec_to_rot_matrix(jnp.array([0.0, 0.0, 0.1])))
        p2[:3, 3] = [0.3, 0.0, 0.4]
        rot_err, trans_err = calc_se3_err(p1, p2)
        np.testing.assert_allclose(rot_err, np.degrees(0.1), atol=1e-3)
        np.testing.assert_allclose(trans_err, 0.5, atol=1e-5)


class TestDynamics:
    def test_hover(self):
        """thrust = m*g exactly cancels gravity: state unchanged (up to drift)."""
        cfg = DynamicsConfig(mass=1.0, g=10.0, dt=0.1)
        x = jnp.zeros(12)
        u = jnp.array([10.0, 0.0, 0.0, 0.0])
        x1 = drone_dynamics(x, u, cfg)
        np.testing.assert_allclose(np.asarray(x1), np.zeros(12), atol=1e-6)

    def test_freefall(self):
        cfg = DynamicsConfig(mass=1.0, g=10.0, dt=0.1)
        x = jnp.zeros(12)
        u = jnp.zeros(4)
        x1 = drone_dynamics(x, u, cfg)
        np.testing.assert_allclose(float(x1[5]), -1.0, atol=1e-6)  # vz = -g*dt

    def test_torque_spins(self):
        cfg = DynamicsConfig(dt=0.1)
        x = jnp.zeros(12)
        u = jnp.array([10.0, 0.0, 0.0, 0.002])
        x1 = drone_dynamics(x, u, cfg)
        assert float(x1[11]) > 0  # omega_z increased

    def test_jacobian_finite(self):
        """The filter's prediction Jacobian (estimator_helpers.py:355-362)."""
        cfg = DynamicsConfig()
        x = jnp.asarray(np.random.default_rng(0).normal(size=12) * 0.1, jnp.float32)
        u = jnp.array([10.0, 0.001, -0.001, 0.002])
        A = jax.jacfwd(lambda s: drone_dynamics(s, u, cfg))(x)
        assert A.shape == (12, 12)
        assert np.all(np.isfinite(np.asarray(A)))

    def test_simulator_18dim(self):
        s0 = np.zeros(18, np.float32)
        s0[6:15] = np.eye(3).reshape(-1)
        sim = Simulator(s0, DynamicsConfig())
        s1 = sim.advance(np.array([10.0, 0, 0, 0], np.float32))
        assert s1.shape == (18,)
        np.testing.assert_allclose(s1[6:15].reshape(3, 3) @ s1[6:15].reshape(3, 3).T,
                                   np.eye(3), atol=1e-5)
