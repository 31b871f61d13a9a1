import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.ops import (
    freq_encode,
    freq_output_dim,
    sh_encode,
    sh_output_dim,
    trunc_exp,
)


class TestFreqEncoder:
    def test_output_dim(self):
        x = jnp.ones((7, 3))
        for deg in [1, 4, 6]:
            out = freq_encode(x, degree=deg)
            assert out.shape == (7, freq_output_dim(3, deg))

    def test_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        out = freq_encode(x, degree=2)
        # layout: [x, sin/cos(2^0 x) interleaved per dim, sin/cos(2^1 x)]
        np.testing.assert_allclose(np.asarray(out[0, :3]), [0.5, -0.25, 1.0], rtol=1e-6)
        # first dim, freq 0: sin(0.5), cos(0.5)
        np.testing.assert_allclose(float(out[0, 3]), np.sin(0.5), rtol=1e-5)
        np.testing.assert_allclose(float(out[0, 4]), np.cos(0.5), rtol=1e-5)

    def test_grad(self):
        g = jax.grad(lambda x: jnp.sum(freq_encode(x, 4)))(jnp.ones((2, 3)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSHEncoder:
    @pytest.mark.parametrize("degree", [1, 2, 3, 4, 8])
    def test_output_dim(self, degree):
        d = jnp.array([[0.0, 0.0, 1.0]])
        assert sh_encode(d, degree).shape == (1, sh_output_dim(degree))

    def test_orthonormality(self):
        """Monte-Carlo check: 4*pi*E[Y_i Y_j] = delta_ij over the sphere."""
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (200_000, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        y = sh_encode(v, degree=4)  # (N, 16)
        gram = 4.0 * np.pi * (np.asarray(y).T @ np.asarray(y)) / v.shape[0]
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_l0_constant(self):
        d = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        y = sh_encode(d, degree=3)
        np.testing.assert_allclose(
            np.asarray(y[:, 0]), np.full(10, 0.5 / np.sqrt(np.pi)), rtol=1e-5
        )

    def test_grad_finite(self):
        d = jnp.array([[0.6, 0.0, 0.8]])
        g = jax.jacobian(lambda v: sh_encode(v, 4))(d)
        assert np.all(np.isfinite(np.asarray(g)))


class TestTruncExp:
    def test_forward(self):
        x = jnp.array([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([-2.0, 0.0, 3.0]), rtol=1e-5)

    def test_grad_clamped(self):
        # at x=20 the gradient must be exp(15), not exp(20)
        g = jax.grad(trunc_exp)(20.0)
        np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
        g2 = jax.grad(trunc_exp)(1.0)
        np.testing.assert_allclose(float(g2), np.exp(1.0), rtol=1e-6)
