"""Density activation: exp with a gradient-clamped backward.

Capability parity: reference activation.py:1-17 (`trunc_exp`) — exp whose VJP
clamps the saved input to [-15, 15] so huge densities cannot blow up gradients.
Forward is a plain exp (no clamp), matching the reference semantics.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
