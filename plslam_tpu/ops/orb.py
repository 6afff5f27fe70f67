"""ORB-style oriented binary descriptors (steered BRIEF), batched.

Reference parity: the cv::ORB describe stage used by stvo-pl
``src/stereoFrame.cpp :: detectPointFeatures`` (orientation by intensity
centroid + rotated 256-pair binary test pattern). The test pattern here
is a fixed seeded Gaussian pattern rather than OpenCV's learned
``bit_pattern_31`` table — descriptors only ever match against other
descriptors from this framework, so only internal consistency and
discriminability matter.

All K keypoints are described in one fused program: patch gather ->
moment reduction -> rotated bilinear sampling -> 256 comparisons.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from plslam_tpu.ops.image import extract_patches

PATCH_HALF = 15           # 31x31 patch, ORB standard
N_BITS = 256
_PATTERN_RADIUS = 10.0    # keep rotated samples inside the patch (10*sqrt2<15)


def _make_pattern() -> np.ndarray:
    """(256, 2, 2) float32 (pair, point, xy) — seeded Gaussian BRIEF pattern."""
    rng = np.random.default_rng(42)
    pts = rng.normal(0.0, _PATTERN_RADIUS / 2.0, size=(N_BITS, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, _PATTERN_RADIUS / np.maximum(norm, 1e-6))
    return (pts * scale).astype(np.float32)


PATTERN = _make_pattern()

# circular mask for the intensity-centroid moments
_d = np.arange(-PATCH_HALF, PATCH_HALF + 1)
_yy, _xx = np.meshgrid(_d, _d, indexing="ij")
_CIRC_MASK = ((_xx ** 2 + _yy ** 2) <= PATCH_HALF ** 2).astype(np.float32)


def orientations(patches: jnp.ndarray) -> jnp.ndarray:
    """(K, 31, 31) patches -> (K,) angle via intensity centroid:
    theta = atan2(m01, m10) over the circular mask."""
    m = jnp.asarray(_CIRC_MASK)
    w = patches * m
    m10 = jnp.sum(w * jnp.asarray(_xx, jnp.float32), axis=(-1, -2))
    m01 = jnp.sum(w * jnp.asarray(_yy, jnp.float32), axis=(-1, -2))
    return jnp.arctan2(m01, m10)


def _sample_patch_bilinear(patches: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (K, P) locations xy (K, P, 2) in patch-centered coords from
    (K, S, S) patches."""
    S = patches.shape[-1]
    x = jnp.clip(xy[..., 0] + PATCH_HALF, 0.0, S - 1.001)
    y = jnp.clip(xy[..., 1] + PATCH_HALF, 0.0, S - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    k = jnp.arange(patches.shape[0])[:, None]
    p00 = patches[k, y0, x0]
    p01 = patches[k, y0, x0 + 1]
    p10 = patches[k, y0 + 1, x0]
    p11 = patches[k, y0 + 1, x0 + 1]
    return ((p00 * (1 - fx) + p01 * fx) * (1 - fy)
            + (p10 * (1 - fx) + p11 * fx) * fy)


def describe(img: jnp.ndarray, uv: jnp.ndarray,
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Describe K keypoints on one (blurred) pyramid level.

    Returns (desc_bits (K, 256) uint8 in {0,1}, angle (K,)).
    """
    patches = extract_patches(img, uv, PATCH_HALF)
    theta = orientations(patches)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotation applied to the pattern: p' = R(theta) p
    pat = jnp.asarray(PATTERN)                       # (256, 2, 2)
    px = pat[..., 0][None]                           # (1, 256, 2)
    py = pat[..., 1][None]
    rx = c[:, None, None] * px - s[:, None, None] * py   # (K, 256, 2)
    ry = s[:, None, None] * px + c[:, None, None] * py
    xy = jnp.stack([rx, ry], axis=-1)                # (K, 256, 2pts, 2)
    K = uv.shape[0]
    vals = _sample_patch_bilinear(patches, xy.reshape(K, N_BITS * 2, 2))
    vals = vals.reshape(K, N_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)
    return bits, theta
