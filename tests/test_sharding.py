"""Data-parallel sharding on the virtual 8-device CPU mesh.

The reference's DDP/NCCL scaffolding (nerf/utils.py:267-268, 305-307,
866-882) maps to `jax.sharding` annotations + implicit XLA SPMD collectives
(SURVEY.md 2.3); these tests pin that behavior without real chips.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.parallel import make_mesh, ray_sharding, replicated, shard_rays


def test_make_mesh_and_shardings():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert ray_sharding(mesh).spec == jax.sharding.PartitionSpec("data")
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_sharded_render_matches_single_device():
    """A jitted render over sharded rays must equal the unsharded result —
    the SPMD partitioning is a pure performance annotation."""
    from nerfnav_tpu.data.synthetic import textured_sphere_field
    from nerfnav_tpu.models import RenderConfig, render_rays

    mesh = make_mesh(8)
    field = textured_sphere_field(radius=0.4)
    rcfg = RenderConfig(num_steps=32, upsample_steps=0, min_near=0.05)
    n = 64  # divisible by 8
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.concatenate(
        [rng.uniform(-0.2, 0.2, (n, 2)), np.full((n, 1), -1.5)], -1), jnp.float32)
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 1.5
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    @jax.jit
    def sharded(o, d):
        rays = shard_rays({"o": o, "d": d}, mesh)
        return render_rays(field, rcfg, rays["o"], rays["d"], bg_color=1.0)["image"]

    @jax.jit
    def plain(o, d):
        return render_rays(field, rcfg, o, d, bg_color=1.0)["image"]

    np.testing.assert_allclose(
        np.asarray(sharded(o, d)), np.asarray(plain(o, d)), atol=1e-5
    )


def test_sharded_grad_psum():
    """Gradients of a loss over sharded rays match the unsharded gradients
    (XLA inserts the all-reduce the reference did via NCCL)."""
    mesh = make_mesh(8)
    x = jnp.arange(32.0).reshape(32, 1)

    def loss(w, x):
        xs = shard_rays({"x": x}, mesh)["x"]
        return jnp.mean((xs * w - 1.0) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(2.0, x)
    g_plain = jax.grad(lambda w: jnp.mean((x * w - 1.0) ** 2))(2.0)
    np.testing.assert_allclose(float(g_sharded), float(g_plain), rtol=1e-6)
