"""SO(3)/SE(3) math for the navigation stack.

Capability parity: reference nav/math_utils.py —
  * `skew_matrix` (176-185), `vec_to_rot_matrix` Rodrigues (159-174),
    `rot_matrix_to_vec` acos_safe-stabilized log map (116-157)
  * `mahalanobis` (22-24), `rot_x` (17-20)
  * `nearestPD`/`isPD` Higham projection (40-86) — host numpy (runs between
    jitted steps on a 12x12 matrix; reference also does this on CPU)
  * `calcSO3Err`/`calcSE3Err` (88-102)

All jnp functions are jit/grad-safe (the planner and filter differentiate
through Rodrigues and the log map thousands of times per solve).
"""

import jax.numpy as jnp
import numpy as np


def skew_matrix(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrices."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def vec_to_rot_matrix(v):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) via Rodrigues.

    Written in terms of theta^2 (smooth in v) with Taylor-switched
    coefficients so value AND all derivatives are finite at ||v|| = 0 — the
    reference merely asserts no NaN (math_utils.py:160); the estimator
    differentiates through this at near-zero rotations every step.
      R = I + A K + B K^2,  K = skew(v),  A = sin(t)/t,  B = (1-cos(t))/t^2.
    """
    t2 = jnp.sum(v * v, axis=-1)[..., None, None]
    small = t2 < 1e-8
    t2_safe = jnp.where(small, 1.0, t2)  # keeps the generic branch NaN-free
    t = jnp.sqrt(t2_safe)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2_safe)
    K = skew_matrix(v)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + A * K + B * (K @ K)


def _acos_safe(x, eps: float = 1e-7):
    """Gradient-stable acos (reference math_utils.py:116-130): clamps input
    and linearizes at the boundary so d/dx stays finite."""
    slope = jnp.arccos(1.0 - eps) / eps
    buf = jnp.clip(x, -1.0 + eps, 1.0 - eps)
    core = jnp.arccos(buf)
    lin_hi = jnp.arccos(1.0 - eps) - slope * (x - (1.0 - eps))
    lin_lo = jnp.arccos(-1.0 + eps) - slope * (x - (-1.0 + eps))
    return jnp.where(x > 1.0 - eps, lin_hi, jnp.where(x < -1.0 + eps, lin_lo, core))


def rot_matrix_to_vec(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3) (log map,
    reference math_utils.py:116-157)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = (trace - 1.0) / 2.0
    theta = _acos_safe(cos_theta)
    off = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta from acos is in [0, pi] so sin(theta) >= 0.
    # theta -> 0 limit: off/2 * (1 + theta^2/6 + ...)
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-12)
    factor = jnp.where(theta < 1e-6, 0.5 + theta**2 / 12.0, theta / (2.0 * sin_theta))
    generic = off * factor[..., None]

    # Near theta = pi the generic form is 0/0: `off` = 2 sin(theta) a decays
    # to fp noise while 1/sin blows up, and the clamp above turned that noise
    # into ~1e5-magnitude vectors (a near-180-degree relative attitude in the
    # planner produced omega ~ 1e6 rad/s and an inf torque^4 cost -> NaN
    # solve). R + R^T - (trace - 1) I = 2(1 - cos) a a^T stays
    # well-conditioned there: its largest-diagonal column IS the axis scaled
    # by 2(1-cos) a_j; sign-align it with `off` (ambiguous only at exactly
    # pi, where a and -a are the same rotation).
    sym = (
        R + jnp.swapaxes(R, -1, -2)
        - (trace - 1.0)[..., None, None] * jnp.broadcast_to(jnp.eye(3), R.shape)
    )
    diag = jnp.stack([sym[..., 0, 0], sym[..., 1, 1], sym[..., 2, 2]], axis=-1)
    j = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(sym, j[..., None, None], axis=-1)[..., 0]
    axis = col / _norm_safe(col)
    sign = jnp.where(jnp.sum(col * off, axis=-1) >= 0.0, 1.0, -1.0)
    near_pi = theta[..., None] * sign[..., None] * axis
    return jnp.where((cos_theta < -0.99)[..., None], near_pi, generic)


def _norm_safe(v, eps: float = 1e-12):
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def rot_x(theta):
    """Rotation about +x (reference math_utils.py:17-20) — the camera-forward
    fixup applied between body and camera frames."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def mahalanobis(x, mu, sigma):
    """(x-mu)^T Sigma^-1 (x-mu) (reference math_utils.py:22-24)."""
    d = x - mu
    return d @ jnp.linalg.solve(sigma, d)


# ----------------------------------------------------------- host-side numpy
def is_pd(A: np.ndarray) -> bool:
    try:
        np.linalg.cholesky(A)
        return True
    except np.linalg.LinAlgError:
        return False


def nearest_pd(A: np.ndarray) -> np.ndarray:
    """Higham's nearest positive-definite projection
    (reference math_utils.py:40-86). Input is sanitized (NaN/inf clamped)
    so one bad filter step cannot poison every later covariance."""
    A = np.nan_to_num(np.asarray(A, np.float64), nan=0.0, posinf=1e6, neginf=-1e6)
    B = (A + A.T) / 2
    try:
        _, s, V = np.linalg.svd(B)
    except np.linalg.LinAlgError:
        # SVD can fail on ill-conditioned input: fall back to eigval clamping
        w, Q = np.linalg.eigh(B)
        return (Q * np.clip(w, 1e-9, None)) @ Q.T
    H = V.T @ np.diag(s) @ V
    A2 = (B + H) / 2
    A3 = (A2 + A2.T) / 2
    if is_pd(A3):
        return A3
    spacing = np.spacing(np.linalg.norm(A))
    eye = np.eye(A.shape[0])
    k = 1
    while not is_pd(A3):
        mineig = np.min(np.real(np.linalg.eigvals(A3)))
        A3 += eye * (-mineig * k**2 + spacing)
        k += 1
    return A3


def calc_so3_err(R1, R2):
    """Geodesic rotation error in degrees (reference math_utils.py:88-96)."""
    R1, R2 = np.asarray(R1), np.asarray(R2)
    rel = R1 @ R2.T
    cos = np.clip((np.trace(rel) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos)))


def calc_se3_err(pose, pose_gt):
    """(rot_err_deg, trans_err) between 4x4 or (R, t) poses
    (reference math_utils.py:98-102)."""
    pose, pose_gt = np.asarray(pose), np.asarray(pose_gt)
    rot_err = calc_so3_err(pose[:3, :3], pose_gt[:3, :3])
    trans_err = float(np.linalg.norm(pose[:3, 3] - pose_gt[:3, 3]))
    return rot_err, trans_err
