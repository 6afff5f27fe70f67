"""SE(3)/SO(3) Lie-group operations, batched and jit-friendly.

Reference parity: stvo-pl ``src/auxiliar.cpp`` free functions
``expmap_se3``, ``logmap_se3``, ``inverse_se3``, ``skew`` — rebuilt as
vectorized jax.numpy with numerically-guarded small-angle branches
(``jnp.where`` on both branches, Taylor fallbacks), so that every op
batches with ``vmap`` and differentiates cleanly.

Conventions:
  * Poses are 4x4 row-major homogeneous matrices ``T = [[R, t], [0, 1]]``.
  * Twists are 6-vectors ``xi = (v, w)`` — translation first, rotation
    second (matches the reference's (rho, phi) ordering in auxiliar.cpp).
  * ``exp_se3`` uses the left-multiplicative convention: an update is
    ``T <- exp_se3(dxi) @ T``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# TPU matmuls default to bfloat16 passes (~4e-3 entry error) — fatal for
# pose math: chained 4x4 products drift and R R^T - I exceeds rotation-
# validity tolerances. Every matrix product in this module is tiny
# (3x3/4x4/6x6), so full-f32 precision costs nothing; mm() is the
# mandatory product operator here.
_HI = lax.Precision.HIGHEST


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul for small pose/covariance matrices."""
    return jnp.matmul(a, b, precision=_HI)


_EPS = 1e-8
# Small-angle switch for the trig series, on theta^2. Must be generous in
# float32: (1 - cos t) underflows catastrophically already at t ~ 1e-3, so
# the Taylor branch takes over below t = 0.01 (series error there ~ 1e-9).
_SMALL_THETA2 = 1e-4


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form Cholesky inverse of SPD (..., 3, 3) matrices.

    jnp.linalg.inv on batched 3x3s lowers to a general LU path that
    measured ~870x slower on TPU (7 ms vs 8 us at batch 8192); the
    Schur-complement LBA inverts its landmark blocks every LM iteration,
    so this is the back-end's hottest primitive. Every caller's blocks
    are symmetric positive definite (J^T W J plus LM damping), where the
    Cholesky route is numerically stable — unlike the adjugate formula,
    which cancels catastrophically on the ill-conditioned blocks of
    weakly-observed landmarks.

    Blocks are scale-normalized first so damped-but-empty landmark
    blocks (~1e-7 I) stay well inside f32 range.
    """
    s = jnp.maximum(jnp.max(jnp.abs(M), axis=(-2, -1)), 1e-30)
    M = M / s[..., None, None]
    eps = 1e-20
    a11, a21, a31 = M[..., 0, 0], M[..., 1, 0], M[..., 2, 0]
    a22, a32, a33 = M[..., 1, 1], M[..., 2, 1], M[..., 2, 2]
    l11 = jnp.sqrt(jnp.maximum(a11, eps))
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, eps))
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, eps))
    # closed-form inverse of the lower-triangular factor
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i32 = -l32 * i22 * i33
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    # inv(M) = Linv^T Linv
    m11 = i11 * i11 + i21 * i21 + i31 * i31
    m12 = i21 * i22 + i31 * i32
    m13 = i31 * i33
    m22 = i22 * i22 + i32 * i32
    m23 = i32 * i33
    m33 = i33 * i33
    out = jnp.stack([jnp.stack([m11, m12, m13], -1),
                     jnp.stack([m12, m22, m23], -1),
                     jnp.stack([m13, m23, m33], -1)], -2)
    return out / s[..., None, None]


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix (auxiliar.cpp::skew)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def _sinc_terms(theta2: jnp.ndarray):
    """Stable (A, B, C) coefficients of the Rodrigues / V-matrix series.

    A = sin(t)/t, B = (1-cos(t))/t^2, C = (1-A)/t^2, with Taylor fallbacks
    near t=0. theta2 is theta squared (avoids a sqrt grad singularity).
    """
    small = theta2 < _SMALL_THETA2
    # guard value keeps NaNs out of the unused branch under jit
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / t2)
    return A, B, C


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_terms(theta2)
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * mm(W, W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Stable for angles in [0, pi); at exactly pi uses the diagonal-based
    axis extraction.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # vee of the antisymmetric part: v = 2 sin(theta) * axis
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    sin_t = jnp.sin(theta)
    small = theta < 1e-5
    near_pi = cos_t < -0.99
    # generic branch: w = theta/(2 sin theta) * v
    scale_gen = jnp.where(small, 0.5 + theta * theta / 12.0,
                          theta / (2.0 * jnp.where(jnp.abs(sin_t) < _EPS, 1.0, sin_t)))
    w_gen = scale_gen[..., None] * v
    # near-pi branch: arccos is ill-conditioned there, so (a) recover theta
    # from the well-conditioned antisymmetric norm (theta = pi - asin(s)),
    # (b) recover the axis from the symmetric part only:
    # (R + R^T)/2 = c I + (1-c) n n^T  ->  n_i^2 = (R_ii - c)/(1 - c).
    s = jnp.clip(0.5 * jnp.linalg.norm(v, axis=-1), 0.0, 1.0)
    theta_pi = jnp.pi - jnp.arcsin(s)
    one_mc = jnp.maximum(1.0 - cos_t, _EPS)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    n_abs = jnp.sqrt(jnp.clip((diag - cos_t[..., None]) / one_mc[..., None], 0.0, 1.0))
    # signs: fix the dominant component positive, others from the symmetric
    # off-diagonals R_kj + R_jk = 2 n_k n_j (1-c)
    k = jnp.argmax(n_abs, axis=-1)
    Rsym = R + jnp.swapaxes(R, -1, -2)
    row_k = jnp.take_along_axis(
        Rsym, k[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    sign_j = jnp.where(row_k >= 0, 1.0, -1.0)
    sign_j = sign_j.at[..., :].set(
        jnp.where(jnp.arange(3) == k[..., None], 1.0, sign_j))
    axis = n_abs * sign_j
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    # overall sign from v (ambiguous only at exactly pi, where both are valid)
    sgn = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = theta_pi[..., None] * axis * sgn
    return jnp.where(near_pi[..., None], w_pi, w_gen)


def _left_jacobian_V(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V such that exp_se3 translation = V @ v."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_terms(theta2)
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * mm(W, W)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist (v, w) -> (..., 4, 4) pose (auxiliar.cpp::expmap_se3)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    V = _left_jacobian_V(w)
    t = mm(V, v[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) pose -> (..., 6) twist (auxiliar.cpp::logmap_se3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    # V^{-1} = I - W/2 + (1/t^2)(1 - A/(2B)) W^2
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_terms(theta2)
    W = skew(w)
    small = theta2 < _SMALL_THETA2
    t2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                     (1.0 - A / (2.0 * B)) / t2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = I - 0.5 * W + coef[..., None, None] * mm(W, W)
    v = mm(Vinv, t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) rigid-motion inverse (auxiliar.cpp::inverse_se3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-mm(Rt, t[..., None])[..., 0])
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def transform_points(T: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return mm(P, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6, 6) adjoint in the (v, w) ordering."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tx = skew(t)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, mm(tx, R)], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_distance(T: jnp.ndarray) -> tuple:
    """Translation norm (m) and rotation angle (rad) of a relative pose."""
    t = jnp.linalg.norm(T[..., :3, 3], axis=-1)
    trace = T[..., 0, 0] + T[..., 1, 1] + T[..., 2, 2]
    ang = jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
    return t, ang


def is_valid_rotation(R: jnp.ndarray, tol: float = 1e-3) -> jnp.ndarray:
    """Orthonormality + det(+1) check, batched."""
    I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    ortho = jnp.max(jnp.abs(mm(R, jnp.swapaxes(R, -1, -2)) - I), axis=(-1, -2)) < tol
    det = jnp.abs(jnp.linalg.det(R) - 1.0) < tol
    return jnp.logical_and(ortho, det)
