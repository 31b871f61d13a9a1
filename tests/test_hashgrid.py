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
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[0][flat]),
                                   rtol=1e-4)

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

        g = jax.jit(jax.grad(loss))(table)
        # check a handful of the touched entries (per level) by finite diffs
        eps = 1e-3
        checked = 0
        for lvl, g_l in enumerate(g):
            g_l = np.asarray(g_l)
            touched = np.argwhere(np.abs(g_l) > 1e-8)[:3]
            for i, j in touched:
                tp = [t.at[i, j].add(eps) if k == lvl else t
                      for k, t in enumerate(table)]
                tm = [t.at[i, j].add(-eps) if k == lvl else t
                      for k, t in enumerate(table)]
                fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
                np.testing.assert_allclose(g_l[i, j], fd, rtol=1e-2, atol=1e-5)
                checked += 1
        assert checked >= 4

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

    def test_cell_layout_shapes_and_grads(self):
        """TPU-fast cell layout: one wide row per cell; same API surface."""
        c = HashGridConfig(input_dim=3, num_levels=4, level_dim=2,
                           base_resolution=4, log2_hashmap_size=9,
                           desired_resolution=32, layout="cell")
        assert c.row_dim == 16
        table = hash_grid_init(jax.random.PRNGKey(0), c)
        assert sum(t.shape[0] for t in table) == c.total_params
        assert all(t.shape[1] == 16 for t in table)
        x = jax.random.uniform(jax.random.PRNGKey(1), (21, 3), minval=-1, maxval=1)
        out = hash_grid_encode(table, x, c, bound=1.0)
        assert out.shape == (21, c.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))

        @jax.jit
        def loss(t):
            return jnp.sum(hash_grid_encode(t, x, c) ** 2)

        g = jax.jit(jax.grad(loss))(table)
        assert all(np.all(np.isfinite(np.asarray(gl))) for gl in g)
        assert max(float(jnp.abs(gl).max()) for gl in g) > 0

    def test_cell_layout_interpolates_within_cell(self):
        """Inside one cell the encoding is trilinear in position."""
        c = HashGridConfig(input_dim=3, num_levels=1, level_dim=2,
                           base_resolution=4, log2_hashmap_size=10, layout="cell")
        table = [
            jnp.asarray(
                np.random.default_rng(0).normal(size=(s, c.row_dim)), jnp.float32
            )
            for s in c.level_sizes
        ]
        # points along a line inside cell (1,1,1): x01 in (0.25, 0.5)
        ts = np.linspace(0.26, 0.49, 7)
        x = jnp.asarray(np.stack([ts, ts, ts], -1) * 2 - 1, jnp.float32)
        out = np.asarray(hash_grid_encode(table, x, c))
        # trilinear along the diagonal is cubic in t; check smoothness via
        # third differences being continuous (no jumps)
        d = np.diff(out[:, 0])
        assert np.all(np.isfinite(d))
        assert np.abs(np.diff(d)).max() < 1.0  # no discontinuity spikes

    def test_cell_layout_trains_like_corner(self):
        """Both layouts can regress a target field to similar loss."""
        import optax

        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3), minval=-1, maxval=1)
        target = jnp.sin(3.0 * x[:, 0:1]) * jnp.cos(2.0 * x[:, 1:2])  # (512,1)
        losses = {}
        for layout in ["corner", "cell"]:
            c = HashGridConfig(input_dim=3, num_levels=4, level_dim=2,
                               base_resolution=4, log2_hashmap_size=8,
                               desired_resolution=16, layout=layout)
            table = hash_grid_init(rng, c)
            w = jax.random.normal(jax.random.PRNGKey(2), (c.output_dim, 1)) * 0.3
            params = {"t": table, "w": w}
            opt = optax.adam(1e-2)
            st = opt.init(params)

            @jax.jit
            def step(params, st):
                def loss_fn(p):
                    f = hash_grid_encode(p["t"], x, c)
                    return jnp.mean((f @ p["w"] - target) ** 2)

                l, g = jax.value_and_grad(loss_fn)(params)
                u, st2 = opt.update(g, st)
                return optax.apply_updates(params, u), st2, l

            for _ in range(300):
                params, st, l = step(params, st)
            losses[layout] = float(l)
        assert losses["cell"] < losses["corner"] * 3 + 1e-3, losses

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

    @pytest.mark.parametrize("layout", ["cell", "corner"])
    def test_sort_backward_matches_xla(self, layout):
        """backward="sort" (sorted segment-sum table gradient) must produce
        the same table gradients as the XLA scatter-add backward."""
        import dataclasses

        c = HashGridConfig(num_levels=4, level_dim=4, base_resolution=4,
                           desired_resolution=32, log2_hashmap_size=7,
                           layout=layout)
        c2 = dataclasses.replace(c, backward="sort")
        table = hash_grid_init(jax.random.PRNGKey(0), c)
        x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3),
                               minval=-0.9, maxval=0.9)
        w = jax.random.normal(jax.random.PRNGKey(2), (c.output_dim,))

        def loss(cfg):
            def f(tbls, xx):
                return jnp.sum(hash_grid_encode(tbls, xx, cfg) * w)
            return f

        g1 = jax.grad(loss(c))(table, x)
        g2 = jax.grad(loss(c2))(table, x)
        # cumsum-diff accumulates in a different order than scatter-add:
        # equal up to f32 reassociation
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)
        # x-gradients still flow (interp weights bypass the custom vjp)
        gx = jax.grad(lambda xx: loss(c2)(table, xx))(x)
        assert np.any(np.asarray(gx) != 0)

    def test_bf16_table_compute_close_to_fp32(self):
        """table_compute_dtype="bfloat16": forward within bf16 tolerance of
        fp32 and table gradients flow (fp32 leaves, bf16 scatter inside)."""
        import dataclasses

        c = HashGridConfig(num_levels=4, level_dim=4, base_resolution=4,
                           desired_resolution=32, log2_hashmap_size=7,
                           layout="cell")
        c16 = dataclasses.replace(c, table_compute_dtype="bfloat16")
        table = hash_grid_init(jax.random.PRNGKey(0), c)
        # magnify features beyond the 1e-4 init so bf16 tolerance is visible
        table = [t * 1e3 for t in table]
        x = jax.random.uniform(jax.random.PRNGKey(1), (129, 3),
                               minval=-0.9, maxval=0.9)
        o32 = np.asarray(hash_grid_encode(table, x, c))
        o16 = np.asarray(hash_grid_encode(table, x, c16))
        np.testing.assert_allclose(o16, o32, rtol=2e-2, atol=1e-3)
        assert not np.array_equal(o16, o32)  # the cast actually happened

        g = jax.grad(lambda t: jnp.sum(hash_grid_encode(t, x, c16) ** 2))(
            table)
        g32 = jax.grad(lambda t: jnp.sum(hash_grid_encode(t, x, c) ** 2))(
            table)
        for a, b in zip(g, g32):
            assert a.dtype == jnp.float32  # master-param gradient dtype
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=2e-2 * 1e3)
