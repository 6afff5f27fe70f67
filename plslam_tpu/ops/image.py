"""Image-space primitives: separable blur, pyramids, gradients, patches.

These replace the OpenCV image plumbing the reference front-end rests on
(cv::GaussianBlur, cv::resize inside cv::ORB / LSDDetector scale-space,
Sobel gradients inside LSD). Everything is fixed-shape jax.numpy /
lax.conv so XLA fuses it; images are (H, W) float32 in [0, 1].
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def separable_filter2d(img: jnp.ndarray, kx: np.ndarray, ky: np.ndarray) -> jnp.ndarray:
    """Separable 2D correlation with edge replication, (H, W) -> (H, W)."""
    rx, ry = len(kx) // 2, len(ky) // 2
    x = img[None, None]  # NCHW
    x = jnp.pad(x, ((0, 0), (0, 0), (ry, ry), (0, 0)), mode="edge")
    x = lax.conv_general_dilated(
        x, jnp.asarray(ky, img.dtype)[None, None, :, None],
        window_strides=(1, 1), padding="VALID")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (rx, rx)), mode="edge")
    x = lax.conv_general_dilated(
        x, jnp.asarray(kx, img.dtype)[None, None, None, :],
        window_strides=(1, 1), padding="VALID")
    return x[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    r = max(1, int(math.ceil(2.5 * sigma)))
    k = gaussian_kernel1d(sigma, r)
    return separable_filter2d(img, k, k)


def resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img, shape, method="bilinear")


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float,
                  blur_sigma: float = 1.0) -> List[jnp.ndarray]:
    """Scale pyramid like cv::ORB's (levels at 1/scale_factor^i), each level
    lightly blurred (the blur also serves the BRIEF sampling smoothness
    requirement). Shapes are static per (H, W, config)."""
    H, W = img.shape
    levels = []
    cur = img
    for i in range(n_levels):
        s = scale_factor ** i
        h, w = max(int(round(H / s)), 16), max(int(round(W / s)), 16)
        if i == 0:
            lvl = img
        else:
            lvl = resize_bilinear(cur, (h, w))
        cur = lvl
        levels.append(gaussian_blur(lvl, blur_sigma))
    return levels


def sobel_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gx, gy) via 3x3 Sobel (LSD uses simple 2x2 differences; Sobel is the
    smoother standard choice and feeds both line detection and LBD)."""
    smooth = np.array([1.0, 2.0, 1.0], np.float32) * 0.25
    diff = np.array([-1.0, 0.0, 1.0], np.float32) * 0.5
    gx = separable_filter2d(img, diff, smooth)
    gy = separable_filter2d(img, smooth, diff)
    return gx, gy


def extract_patches(img: jnp.ndarray, uv: jnp.ndarray, half: int) -> jnp.ndarray:
    """Gather (K, 2h+1, 2h+1) patches centered at integer-rounded uv.

    Out-of-bounds clamps to the border (callers keep keypoints inside a
    margin, so clamping never changes valid features).
    """
    H, W = img.shape
    u = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), half, W - 1 - half)
    v = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), half, H - 1 - half)
    d = jnp.arange(-half, half + 1)
    vi = v[:, None, None] + d[None, :, None]
    ui = u[:, None, None] + d[None, None, :]
    return img[vi, ui]


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (..., 2) float (x, y) locations bilinearly; clamps at borders."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    p00 = img[y0, x0]
    p01 = img[y0, x0 + 1]
    p10 = img[y0 + 1, x0]
    p11 = img[y0 + 1, x0 + 1]
    return ((p00 * (1 - fx) + p01 * fx) * (1 - fy)
            + (p10 * (1 - fx) + p11 * fx) * fy)
