"""Density activation: exp with a gradient-clamped backward.

Capability parity: reference activation.py:1-17 (`trunc_exp`) — exp whose
derivative clamps the saved input to [-15, 15] so huge densities cannot blow
up gradients. Forward is a plain exp (no clamp), matching the reference
semantics.

Implemented as a `custom_jvp` (not `custom_vjp`): the clamped derivative is
expressible as a JVP rule, and JAX derives the transposed (reverse-mode) rule
from it automatically — so the op supports BOTH autodiff modes. The pose
filter's Gauss-Newton/LM optimizer builds its Jacobian with `jax.linearize`
(forward mode) through the renderer (nav/estimator.py), which a custom_vjp
would reject.
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return jnp.exp(x), t * jnp.exp(jnp.clip(x, -15.0, 15.0))
