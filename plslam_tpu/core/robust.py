"""Robust statistics for the GN/LM solvers.

Reference parity: stvo-pl ``src/auxiliar.cpp`` — ``vector_stdv_mad``
(median-absolute-deviation robust scale) and the per-residual robust
weight functions used by ``stereoFrameHandler.cpp::optimizePose`` and
``mapHandler.cpp::levMarquardtOptimizationLBA``. All masked + batched:
invalid entries never influence the statistics.
"""

from __future__ import annotations

import jax.numpy as jnp

# 1 / Phi^-1(3/4): consistency constant making MAD estimate sigma for gaussians
_MAD_SIGMA = 1.4826


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x[mask] along the last axis, fixed-shape.

    Invalid entries are sorted to +inf and the median index is computed
    from the true count, so the result equals numpy's median of the
    compacted array (lower-middle element for even counts).
    """
    big = jnp.asarray(jnp.finfo(x.dtype).max, dtype=x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    n = jnp.sum(mask, axis=-1).astype(jnp.int32)
    idx = jnp.maximum((n - 1) // 2, 0)
    med = jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]
    return jnp.where(n > 0, med, 0.0)


def mad_scale(r: jnp.ndarray, mask: jnp.ndarray, min_scale: float = 1e-4) -> jnp.ndarray:
    """Robust sigma via MAD (auxiliar.cpp::vector_stdv_mad).

    sigma = 1.4826 * median(|r - median(r)|). Floored to keep weights
    finite on near-perfect synthetic data.
    """
    med = masked_median(r, mask)
    sigma = _MAD_SIGMA * masked_median(jnp.abs(r - med[..., None]), mask)
    return jnp.maximum(sigma, min_scale)


def mad_scale_zero_centered(r_abs: jnp.ndarray, mask: jnp.ndarray,
                            min_scale: float = 1e-4) -> jnp.ndarray:
    """MAD scale assuming a zero-centered residual (|r| given)."""
    sigma = _MAD_SIGMA * masked_median(r_abs, mask)
    return jnp.maximum(sigma, min_scale)


def tstudent_weight(r: jnp.ndarray, sigma: jnp.ndarray, dof: float = 5.0) -> jnp.ndarray:
    """t-distribution robust weight, the reference VO default:
    w = (dof + 1) / (dof + (r/sigma)^2)."""
    x2 = (r / sigma) ** 2
    return (dof + 1.0) / (dof + x2)


def cauchy_weight(r: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Cauchy robust weight w = 1 / (1 + (r/sigma)^2)."""
    return 1.0 / (1.0 + (r / sigma) ** 2)


def huber_weight(r: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Huber weight: 1 inside |r|<=k, k/|r| outside."""
    a = jnp.abs(r)
    return jnp.where(a <= k, 1.0, k / jnp.maximum(a, 1e-12))


def pose_cov_entropy(cov: jnp.ndarray) -> jnp.ndarray:
    """Differential entropy (up to a constant) of a 6x6 pose covariance:
    h = 0.5 * log(det(cov)). Used by the reference's keyframe criterion
    (stereoFrameHandler.cpp::currFrameIsKF entropy-ratio test)."""
    sign, logdet = jnp.linalg.slogdet(cov)
    return 0.5 * jnp.where(sign > 0, logdet, -jnp.inf)
