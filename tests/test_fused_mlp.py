"""Fused-MLP kernel vs XLA golden reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.ops.fused_mlp import (
    fused_mlp,
    fused_mlp_forward,
    fused_mlp_reference,
)


def make_weights(key, dims):
    ks = jax.random.split(key, len(dims) - 1)
    return [
        jax.random.normal(k, (dims[i], dims[i + 1]), jnp.float32) * 0.1
        for i, k in enumerate(ks)
    ]


@pytest.mark.parametrize("dims", [(64, 128, 128, 16), (32, 64, 64, 64, 8),
                                  (48, 128, 3)])
def test_matches_reference(dims):
    x = jax.random.normal(jax.random.PRNGKey(0), (300, dims[0]))
    ws = make_weights(jax.random.PRNGKey(1), dims)
    out = fused_mlp_forward(x, ws, interpret=True)
    ref = fused_mlp_reference(x, ws)
    assert out.shape == (300, dims[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_activations():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    ws = make_weights(jax.random.PRNGKey(1), (32, 64, 4))
    for act_out in ["none", "exp", "sigmoid"]:
        out = fused_mlp_forward(x, ws, output_activation=act_out, interpret=True)
        ref = fused_mlp_reference(x, ws, output_activation=act_out)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)


def test_batch_padding_exact():
    """Non-multiple batch sizes pad internally and slice back exactly."""
    ws = make_weights(jax.random.PRNGKey(1), (16, 64, 4))
    for n in [1, 17, 1024, 1025]:
        x = jax.random.normal(jax.random.PRNGKey(n), (n, 16))
        out = fused_mlp_forward(x, ws, interpret=True)
        assert out.shape == (n, 4)
        ref = fused_mlp_reference(x, ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)


def test_gradients_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 32))
    ws = make_weights(jax.random.PRNGKey(1), (32, 64, 8))

    def loss_fused(x, ws):
        return jnp.sum(fused_mlp(x, ws, "relu", "none", True) ** 2)

    def loss_ref(x, ws):
        return jnp.sum(fused_mlp_reference(x, ws).astype(jnp.float32) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, ws)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=0.5,
                               rtol=0.15)
    for a, b in zip(gw_f, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.5,
                                   rtol=0.15)
