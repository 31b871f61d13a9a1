import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.models import NetworkConfig, init_network, density, forward


@pytest.fixture(scope="module")
def small_cfg():
    # shrunken grid so CPU tests stay fast; full schedule covered in test_hashgrid
    return NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=10,
                         grid_max_resolution=64)


@pytest.fixture(scope="module")
def params(small_cfg):
    return init_network(jax.random.PRNGKey(0), small_cfg)


def test_density_shapes(params, small_cfg):
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-1, maxval=1)
    out = density(params, x, small_cfg)
    assert out["sigma"].shape == (17,)
    assert out["geo_feat"].shape == (17, small_cfg.geo_feat_dim)
    assert np.all(np.asarray(out["sigma"]) > 0)  # trunc_exp output


def test_forward_shapes(params, small_cfg):
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sigma, rgb = forward(params, x, d, small_cfg)
    assert sigma.shape == (8,)
    assert rgb.shape == (8, 3)
    rgb = np.asarray(rgb)
    assert np.all((rgb >= 0) & (rgb <= 1))  # sigmoid


def test_density_grad_wrt_x(params, small_cfg):
    """The planner differentiates density w.r.t. position (quad_plot.py:224-250)."""
    x = jnp.array([[0.2, -0.3, 0.1]])
    g = jax.grad(lambda xx: jnp.sum(density(params, xx, small_cfg)["sigma"]))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_vanilla_backend():
    cfg = NetworkConfig(encoding="frequency", encoding_dir="sphere_harmonics",
                        grid_levels=4, grid_log2_hashmap_size=10)
    p = init_network(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    sigma, rgb = forward(p, x, d, cfg)
    assert sigma.shape == (4,) and rgb.shape == (4, 3)


def test_background_net():
    cfg = NetworkConfig(bg_radius=32.0, grid_levels=4, grid_log2_hashmap_size=10,
                        grid_max_resolution=64)
    p = init_network(jax.random.PRNGKey(0), cfg)
    assert "bg_net" in p and "bg_encoder" in p
    from nerfnav_tpu.models import background

    sph = jnp.zeros((5, 2))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    rgb = background(p, sph, d, cfg)
    assert rgb.shape == (5, 3)


def test_fused_mlp_backend_matches_xla(small_cfg, params):
    """--ff parity: fused backend output == xla backend (same params)."""
    import dataclasses

    cfg_ff = dataclasses.replace(small_cfg, mlp_backend="fused")
    x = jax.random.uniform(jax.random.PRNGKey(5), (16, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(6), (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    s1, r1 = forward(params, x, d, small_cfg)
    s2, r2 = forward(params, x, d, cfg_ff)
    # fused computes in bf16: tolerances accordingly
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=0.1, atol=0.05)


def test_jit_forward(params, small_cfg):
    f = jax.jit(lambda x, d: forward(params, x, d, small_cfg))
    x = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    sigma, rgb = f(x, d)
    assert np.all(np.isfinite(np.asarray(sigma)))
