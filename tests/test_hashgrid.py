import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.ops import HashGridConfig, hash_grid_encode, hash_grid_init


@pytest.fixture
def cfg():
    return HashGridConfig(
        input_dim=3, num_levels=4, level_dim=2,
        base_resolution=4, log2_hashmap_size=9, desired_resolution=32,
    )


class TestSchedule:
    def test_default_schedule_matches_reference(self):
        # L=16, base 16, desired 2048*bound with bound=1 (grid.py:94-131)
        c = HashGridConfig(num_levels=16, base_resolution=16, desired_resolution=2048)
        assert c.resolutions[0] == 16
        assert c.resolutions[-1] == 2048
        # geometric growth factor
        np.testing.assert_allclose(c.scale, 2 ** (np.log2(2048 / 16) / 15), rtol=1e-9)
        # early levels dense ((R+1)^3 params, 8-aligned), late levels capped at 2^19
        assert c.level_sizes[0] == int(np.ceil(17**3 / 8) * 8)
        assert c.level_sizes[-1] == 2**19
        assert c.offsets[0] == 0
        assert c.offsets[1] == c.level_sizes[0]

    def test_output_dim(self, cfg):
        assert cfg.output_dim == 8


class TestEncode:
    def test_shapes_and_finite(self, cfg):
        table = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=-1, maxval=1)
        out = hash_grid_encode(table, x, cfg, bound=1.0)
        assert out.shape == (33, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_out_of_bounds_zero(self, cfg):
        table = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        out = hash_grid_encode(table, x, cfg, bound=1.0)
        assert np.allclose(np.asarray(out[0]), 0.0)
        assert not np.allclose(np.asarray(out[1]), 0.0)

    def test_interpolation_exact_at_vertices(self):
        """At a grid vertex of a dense level, output == stored feature."""
        c = HashGridConfig(input_dim=3, num_levels=1, level_dim=2,
                           base_resolution=4, log2_hashmap_size=10)
        table = hash_grid_init(jax.random.PRNGKey(0), c)
        # vertex (1,2,3) of the 5^3 grid; x01 = v/4 -> x = 2*x01-1
        v = np.array([1, 2, 3])
        x01 = v / 4.0
        x = jnp.asarray(2 * x01 - 1)[None].astype(jnp.float32)
        out = hash_grid_encode(table, x, c, bound=1.0)
        flat = (v[0] * 5 + v[1]) * 5 + v[2]
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[flat]), rtol=1e-4)

    def test_continuity(self, cfg):
        """Encoding is continuous: tiny input perturbation -> tiny output change."""
        table = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[0.3, -0.2, 0.55]])
        a = hash_grid_encode(table, x, cfg)
        b = hash_grid_encode(table, x + 1e-6, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_grad_wrt_table_matches_fd(self, cfg):
        """jax.grad through the gather == finite differences on the table."""
        table = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(2), (5, 3), minval=-0.9, maxval=0.9)
        w = jax.random.normal(jax.random.PRNGKey(3), (5, cfg.output_dim))

        @jax.jit
        def loss(t):
            return jnp.sum(hash_grid_encode(t, x, cfg) * w)

        g = np.asarray(jax.jit(jax.grad(loss))(table))
        # check a handful of the touched entries by finite differences
        touched = np.argwhere(np.abs(g) > 1e-8)[:10]
        eps = 1e-3
        for i, j in touched:
            tp = table.at[i, j].add(eps)
            tm = table.at[i, j].add(-eps)
            fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-2, atol=1e-5)

    def test_grad_wrt_input(self, cfg):
        table = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[0.31, -0.22, 0.53]])

        @jax.jit
        def f(xx):
            return jnp.sum(hash_grid_encode(table, xx, cfg) ** 2)

        g = np.asarray(jax.jit(jax.grad(f))(x))
        eps = 1e-4
        for d in range(3):
            xp = x.at[0, d].add(eps)
            xm = x.at[0, d].add(-eps)
            fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
            np.testing.assert_allclose(g[0, d], fd, rtol=5e-2, atol=1e-4)

    def test_jit_and_vmap_compatible(self, cfg):
        table = hash_grid_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
        f = jax.jit(lambda t, xx: hash_grid_encode(t, xx, cfg))
        np.testing.assert_allclose(
            np.asarray(f(table, x)), np.asarray(hash_grid_encode(table, x, cfg)),
            rtol=1e-5, atol=1e-7,
        )

    def test_2d_grid(self):
        """Background model uses a 2D hash grid (reference network.py:71-92)."""
        c = HashGridConfig(input_dim=2, num_levels=4, level_dim=2,
                           base_resolution=4, desired_resolution=64,
                           log2_hashmap_size=8)
        table = hash_grid_init(jax.random.PRNGKey(0), c)
        x = jax.random.uniform(jax.random.PRNGKey(1), (9, 2), minval=-1, maxval=1)
        out = hash_grid_encode(table, x, c)
        assert out.shape == (9, c.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))
