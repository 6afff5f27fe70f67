"""Image-space primitives: separable blur, pyramids, gradients, patches.

These replace the OpenCV image plumbing the reference front-end rests on
(cv::GaussianBlur, cv::resize inside cv::ORB / LSDDetector scale-space,
Sobel gradients inside LSD).

TPU-shaped (v2, after device profiling): every separable filter and
bilinear resize is executed as a pair of BANDED-MATRIX MATMULS —
``K_rows @ img @ K_cols^T`` — instead of lax.conv / jax.image.resize.
Single-channel convs and generic resizes lower to slow VPU/gather code;
the same math as a dense (H, H) x (H, W) matmul rides the MXU and is
~50x faster at these sizes. The banded operator matrices are built on
host (numpy, cached per shape/kernel) and are tiny.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@lru_cache(maxsize=256)
def _filter_matrix(n: int, kernel_bytes: bytes) -> np.ndarray:
    """(n, n) banded correlation matrix with edge-replicate boundary."""
    k = np.frombuffer(kernel_bytes, dtype=np.float32)
    r = len(k) // 2
    M = np.zeros((n, n), np.float32)
    for i in range(n):
        for j, kv in enumerate(k):
            src = min(max(i + j - r, 0), n - 1)
            M[i, src] += kv
    return M


@lru_cache(maxsize=256)
def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix (align_corners=False,
    matching jax.image.resize 'bilinear' sampling)."""
    M = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        a = min(max(x0, 0), n_in - 1)
        b = min(max(x0 + 1, 0), n_in - 1)
        M[i, a] += 1.0 - f
        M[i, b] += f
    return M


def _apply_rows_cols(img: jnp.ndarray, Mr: np.ndarray, Mc: np.ndarray
                     ) -> jnp.ndarray:
    """Mr @ img @ Mc^T with f32 accumulation on the MXU."""
    out = jnp.dot(jnp.asarray(Mr), img, preferred_element_type=jnp.float32)
    return jnp.dot(out, jnp.asarray(Mc).T, preferred_element_type=jnp.float32)


def separable_filter2d(img: jnp.ndarray, kx: np.ndarray, ky: np.ndarray
                       ) -> jnp.ndarray:
    """Separable 2D correlation with edge replication, (H, W) -> (H, W)."""
    H, W = img.shape
    Mr = _filter_matrix(H, np.asarray(ky, np.float32).tobytes())
    Mc = _filter_matrix(W, np.asarray(kx, np.float32).tobytes())
    return _apply_rows_cols(img, Mr, Mc)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    r = max(1, int(math.ceil(2.5 * sigma)))
    k = gaussian_kernel1d(sigma, r)
    return separable_filter2d(img, k, k)


def resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    H, W = img.shape
    Mr = _resize_matrix(shape[0], H)
    Mc = _resize_matrix(shape[1], W)
    return _apply_rows_cols(img, Mr, Mc)


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
    smoother standard choice and feeds both line detection and LBD).

    Implemented as padded shifted adds, NOT the banded-matmul path: a
    3-tap kernel needs ~6 madds/pixel on the VPU, while the dense
    operator matrix spends 2*(H+W) FLOP/pixel on the MXU — measured ~25x
    more device time at VGA+ sizes. One shared edge pad feeds both
    directions."""
    p = jnp.pad(img, 1, mode="edge")                     # (H+2, W+2)
    sy = (p[:-2] + 2.0 * p[1:-1] + p[2:]) * 0.25          # smooth along y
    dy = (p[2:] - p[:-2]) * 0.5                           # diff along y
    gx = (sy[:, 2:] - sy[:, :-2]) * 0.5                   # diff along x
    gy = (dy[:, :-2] + 2.0 * dy[:, 1:-1] + dy[:, 2:]) * 0.25
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


def bilinear_sample_mxu(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling executed as MXU matmuls instead of gathers.

    Bilinear interpolation is separable: sample(y, x) = hat_y^T @ img @
    hat_x with two-tap "hat" weight vectors per axis, so a batch of N
    samples is ``einsum('nh,hw,nw->n', A, img, B)`` — one (N, H) x
    (H, W) matmul plus a row-wise weighted reduction. TPU gathers
    serialize per element (~38 M/s measured on this chip); this form
    runs at MXU rate and measured ~4x faster at the LBD sample counts.
    Accumulation happens at TPU-default (bf16-input) matmul precision:
    ~1e-3 absolute error, fine for any consumer that aggregates or
    binarizes samples (LBD band statistics), not for sub-pixel-critical
    paths (use ``bilinear_sample``).

    img: (H, W); xy: (..., 2) float (x, y) locations, clamped to borders.
    """
    H, W = img.shape
    shp = xy.shape[:-1]
    x = jnp.clip(xy[..., 0].reshape(-1), 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1].reshape(-1), 0.0, H - 1.001)
    iy = jnp.arange(H, dtype=jnp.float32)
    ix = jnp.arange(W, dtype=jnp.float32)
    A = jnp.maximum(1.0 - jnp.abs(y[:, None] - iy[None, :]), 0.0)
    B = jnp.maximum(1.0 - jnp.abs(x[:, None] - ix[None, :]), 0.0)
    # column interpolation first: the (H, N) intermediate is smaller than
    # (N, W) at landscape aspect ratios -> less HBM traffic (measured 1.5x)
    cols = jnp.dot(img.astype(jnp.bfloat16), B.T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)        # (H, N)
    out = jnp.sum(cols * A.T, axis=0)
    return out.reshape(shp)


def bilinear_sample_mxu_multi(imgs: Tuple[jnp.ndarray, ...], xy: jnp.ndarray,
                              n_chunk: int = 8192
                              ) -> Tuple[jnp.ndarray, ...]:
    """``bilinear_sample_mxu`` of several same-shape images at the same
    locations, sharing one column-interpolation matmul (images
    concatenate along the row axis -> one (C*H, W) x (W, N) matmul).

    The sample axis is processed in static slices of ``n_chunk``: the
    (C*H, N) interpolation intermediate cannot fuse into the dot, and at
    full size it dominates HBM (batched over a 60-frame tracking chunk
    it reached 20 GB and failed to compile). Slicing bounds the live
    intermediate to (C*H, n_chunk) per step with identical results.
    """
    H, W = imgs[0].shape
    C = len(imgs)
    cat = jnp.concatenate(imgs, axis=0)                       # (C*H, W)
    shp = xy.shape[:-1]
    x = jnp.clip(xy[..., 0].reshape(-1), 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1].reshape(-1), 0.0, H - 1.001)
    N = x.shape[0]
    iy = jnp.arange(H, dtype=jnp.float32)
    ix = jnp.arange(W, dtype=jnp.float32)
    cat16 = cat.astype(jnp.bfloat16)
    pieces = []
    for lo in range(0, N, n_chunk):
        xs = x[lo:lo + n_chunk]
        ys = y[lo:lo + n_chunk]
        A = jnp.maximum(1.0 - jnp.abs(ys[:, None] - iy[None, :]), 0.0)
        B = jnp.maximum(1.0 - jnp.abs(xs[:, None] - ix[None, :]), 0.0)
        cols = jnp.dot(cat16, B.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)    # (C*H, n)
        cols = cols.reshape(C, H, -1)
        pieces.append(jnp.sum(cols * A.T[None], axis=1))      # (C, n)
    out = jnp.concatenate(pieces, axis=-1)                    # (C, N)
    return tuple(out[c].reshape(shp) for c in range(C))


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
