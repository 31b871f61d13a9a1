"""Classic NeRF sin/cos positional (frequency) encoding.

Capability parity: reference freqencoder/ (CUDA `kernel_freq`,
freqencoder/src/freqencoder.cu:30-58) and the pure-torch fallback
(encoding.py:5-43). On TPU this is pure VPU element-wise math — no kernel
needed; XLA fuses the sin/cos into neighbouring ops and autodiff replaces the
hand-written backward (freqencoder.cu:63-94).

Output layout: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(D-1) x), cos(2^(D-1) x)]
giving dim = input_dim * (1 + 2 * degree), matching freqencoder/freq.py:61.
"""

import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)


def freq_encode(x: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """x: (..., D) -> (..., D * (1 + 2*degree)). Static `degree`."""
    if degree <= 0:
        return x
    # (..., D, F): x scaled by 2^f for each frequency band.
    freqs = jnp.asarray([2.0**f for f in range(degree)], dtype=x.dtype)
    xb = x[..., None] * freqs  # (..., D, F)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per-frequency: (..., D, F, 2) -> (..., D*2F) then prepend x
    sc = jnp.stack([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, sc], axis=-1)
