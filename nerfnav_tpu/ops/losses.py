"""Training losses.

Capability parity: reference loss.py:1-76 — MAPE, Huber, and the O(N)
mip-NeRF-360-style distortion loss (`EffDistLoss`). The reference implements a
custom backward for the distortion loss; under JAX the closed-form forward
below autodiffs to the same O(N) gradient, so no custom VJP is needed.
The default training criterion remains plain MSE (reference main_nerf.py:98),
provided by the Trainer.
"""

import jax
import jax.numpy as jnp


def mape_loss(pred, target, reduction: str = "mean"):
    """Mean absolute percentage error with detached denominator (loss.py:6-16)."""
    difference = (pred - target).astype(jnp.float32)
    scale = 1.0 / (jnp.abs(jax.lax.stop_gradient(target)) + 1e-2)
    loss = jnp.abs(difference) * scale
    return jnp.mean(loss) if reduction == "mean" else loss


def huber_loss(pred, target, delta: float = 0.1, reduction: str = "mean"):
    """Huber loss (loss.py:19-29)."""
    rel = jnp.abs(pred - target).astype(jnp.float32)
    sqr = (0.5 / delta) * rel * rel
    loss = jnp.where(rel > delta, rel - 0.5 * delta, sqr)
    return jnp.mean(loss) if reduction == "mean" else loss


def eff_distloss(w, t, interval):
    """O(N) distortion loss (mip-NeRF-360; reference loss.py:32-76).

    w: (..., N) per-sample weights; t: (..., N) midpoint positions (normalized);
    interval: scalar or (..., N) bin widths.

    loss = sum_{i,j} w_i w_j |t_i - t_j| + (1/3) sum_i w_i^2 interval_i
    computed in O(N) via prefix sums over samples sorted by t (t must be
    ascending along the last axis, which ray marching guarantees).
    """
    wm = w * t
    w_cum = jnp.cumsum(w, axis=-1)
    wm_cum = jnp.cumsum(wm, axis=-1)
    w_prev = w_cum - w
    wm_prev = wm_cum - wm
    # cross term: 2 * sum_i w_i * (t_i * W_{<i} - WM_{<i})
    cross = 2.0 * jnp.sum(w * (t * w_prev - wm_prev), axis=-1)
    self_term = jnp.sum(w * w * interval, axis=-1) / 3.0
    return jnp.mean(cross + self_term)
