"""Real spherical-harmonics view-direction encoding, degree 1..8.

Capability parity: reference shencoder/ (hard-coded real SH polynomials up to
l=7, shencoder/src/shencoder.cu:50-123, wrapped at
shencoder/sphere_harmonics.py:61-86; output dim = degree**2).

TPU-native design: instead of 440 lines of hard-coded polynomials + analytic
dy/dx tables, the basis is generated at *trace time* from the standard
associated-Legendre recurrences — the compiled XLA program is the same fused
chain of VPU mul/adds the hand-expanded polynomials would produce, and JAX
autodiff replaces the hand-written gradient tables (shencoder.cu:126-360).
Constant folding happens in the compiler, so there is zero runtime recurrence
cost. Convention: orthonormal real SH with Condon–Shortley phase; any fixed
convention is equivalent parity-wise since the basis feeds a learned MLP.
"""

import math

import jax.numpy as jnp


def sh_output_dim(degree: int) -> int:
    return degree * degree


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _K(l: int, m: int) -> float:
    """Orthonormalization constant sqrt((2l+1)/(4pi) * (l-m)!/(l+m)!)."""
    num = (2 * l + 1) * math.factorial(l - m)
    den = 4.0 * math.pi * math.factorial(l + m)
    return math.sqrt(num / den)


def sh_encode(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """d: (..., 3) unit direction -> (..., degree**2) real-SH basis values.

    `degree` is static, 1 <= degree <= 8 (l = 0..degree-1).
    """
    if not 1 <= degree <= 8:
        raise ValueError(f"sh_encode supports degree 1..8, got {degree}")
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(z)

    # A_m = Re((x+iy)^m), B_m = Im((x+iy)^m): the sin^m(theta)*{cos,sin}(m phi)
    # factors, built by complex-multiplication recurrence.
    A = [one]
    B = [jnp.zeros_like(z)]
    for m in range(1, degree):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])

    # Q[l][m] = P_l^m(z) / sin^m(theta): polynomial in z via the recurrences
    #   Q_m^m     = (-1)^m (2m-1)!!
    #   Q_{m+1}^m = z (2m+1) Q_m^m
    #   Q_l^m     = ((2l-1) z Q_{l-1}^m - (l+m-1) Q_{l-2}^m) / (l-m)
    Q = {}
    for m in range(degree):
        Q[(m, m)] = ((-1.0) ** m) * _double_factorial(2 * m - 1) * one
        if m + 1 < degree:
            Q[(m + 1, m)] = z * (2 * m + 1) * Q[(m, m)]
        for l in range(m + 2, degree):
            Q[(l, m)] = ((2 * l - 1) * z * Q[(l - 1, m)] - (l + m - 1) * Q[(l - 2, m)]) / (
                l - m
            )

    comps = []
    sqrt2 = math.sqrt(2.0)
    for l in range(degree):
        for m in range(-l, l + 1):
            am = abs(m)
            if m == 0:
                comps.append(_K(l, 0) * Q[(l, 0)])
            elif m > 0:
                comps.append(sqrt2 * _K(l, am) * Q[(l, am)] * A[am])
            else:
                comps.append(sqrt2 * _K(l, am) * Q[(l, am)] * B[am])
    return jnp.stack(comps, axis=-1)
