"""FAST-16 corner detection, fully vectorized for the TPU VPU.

Reference parity: the cv::ORB FAST stage used by stvo-pl
``src/stereoFrame.cpp :: detectPointFeatures`` (including the
``adaptative_fast`` threshold fallback and the grid bucketing the
reference gets from ``gridStructure.cpp``).

Design: instead of the pointer-chasing per-pixel early-exit loop of the
CPU implementation, the 16 Bresenham-circle taps become 16 shifted image
planes; the "9 contiguous of 16" test is a windowed sum over a doubled
boolean stack; NMS is a max-pool; spatial spread is enforced by per-cell
top-k. Zero data-dependent control flow: one fused XLA program.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

# Bresenham circle radius 3, clockwise from 12 o'clock: (dy, dx)
_CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)

_ARC = 9  # contiguous taps required


def _circle_taps(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) stack of circle-tap values via pad+slice (edge padded)."""
    H, W = img.shape
    p = jnp.pad(img, 3, mode="edge")
    taps = [p[3 + dy:3 + dy + H, 3 + dx:3 + dx + W] for dy, dx in _CIRCLE]
    return jnp.stack(taps, axis=0)


def _contiguous_arc(mask: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) bool -> (H, W) bool: any 9 contiguous (circularly)."""
    ext = jnp.concatenate([mask, mask[:_ARC - 1]], axis=0).astype(jnp.int32)
    cs = jnp.cumsum(ext, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    runs = cs[_ARC:] - cs[:-_ARC]          # (16, H, W) window sums
    return jnp.max(runs, axis=0) >= _ARC


def _arc9_from_bitmask(m: jnp.ndarray) -> jnp.ndarray:
    """int32 bitmask plane (bits 0..15 = circle taps) -> bool plane: any 9
    circularly-contiguous bits set. Doubled-word bit trick: after 8 rounds
    of d &= d >> 1 on (m | m << 16), bit i survives iff bits i..i+8 were
    all set; any surviving start position in 0..15 means a valid arc."""
    d = m | (m << 16)
    for _ in range(_ARC - 1):
        d = d & (d >> 1)
    return (d & jnp.int32(0xFFFF)) != 0


def fast_score_map(img: jnp.ndarray, th: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corner mask and SAD-style score at threshold ``th``.

    score = max(sum of (tap - c - th)+ , sum of (c - th - tap)+) — the
    standard vectorized surrogate for OpenCV's arc score.
    """
    corner, _, score = fast_score_map2(img, th, th)
    return corner, score


def fast_score_map2(img: jnp.ndarray, th_hi: float, th_lo: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Corner masks at two thresholds + SAD score, one streaming pass.

    Memory-shaped for the TPU: instead of materializing a (16, H, W) tap
    stack (and per-threshold boolean stacks — tens of MB of fusion
    temporaries, measured as the dominant front-end cost), the 16 taps
    are consumed one shifted VIEW at a time into 6 running accumulator
    planes: two int32 bitmasks per threshold (bright/dark) and two score
    sums. The 9-contiguous arc test runs on the packed bitmasks with the
    doubled-word bit trick. ~5x less HBM traffic, same results.

    Returns (corner_hi, corner_lo, score) with score computed at th_lo.
    """
    H, W = img.shape
    p = jnp.pad(img, 3, mode="edge")
    zero_i = jnp.zeros((H, W), jnp.int32)
    bh_hi = bd_hi = bh_lo = bd_lo = zero_i
    sb = sd = jnp.zeros((H, W), img.dtype)
    same = (th_lo == th_hi)
    for i, (dy, dx) in enumerate(_CIRCLE):
        tap = p[3 + dy:3 + dy + H, 3 + dx:3 + dx + W]
        diff = tap - img
        bit = jnp.int32(1 << i)
        bh_hi = bh_hi | jnp.where(diff > th_hi, bit, 0)
        bd_hi = bd_hi | jnp.where(diff < -th_hi, bit, 0)
        if not same:
            bh_lo = bh_lo | jnp.where(diff > th_lo, bit, 0)
            bd_lo = bd_lo | jnp.where(diff < -th_lo, bit, 0)
        sb = sb + jnp.maximum(diff - th_lo, 0.0)
        sd = sd + jnp.maximum(-diff - th_lo, 0.0)
    corner_hi = _arc9_from_bitmask(bh_hi) | _arc9_from_bitmask(bd_hi)
    if same:
        corner_lo = corner_hi
    else:
        corner_lo = _arc9_from_bitmask(bh_lo) | _arc9_from_bitmask(bd_lo)
    score = jnp.maximum(sb, sd)
    return corner_hi, corner_lo, score


def nms(score: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(H, W) bool: local maxima within a (2r+1)^2 window.

    Separable max (rows then cols): 2*(2r+1) compares/pixel instead of
    (2r+1)^2 — the max-pool is decomposable and this measurably beats
    the single 2D reduce_window on TPU.
    """
    w = 2 * radius + 1
    mx = lax.reduce_window(score, -jnp.inf, lax.max, (1, w), (1, 1), "SAME")
    mx = lax.reduce_window(mx, -jnp.inf, lax.max, (w, 1), (1, 1), "SAME")
    return score >= mx


def select_topk_grid(score: jnp.ndarray, k_total: int, grid_rows: int,
                     grid_cols: int, block: int = 8
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spread-preserving top-k: per-grid-cell top-q, then global top-k.

    Returns (uv (K, 2) float32 in (x, y) order, score (K,), valid (K,)).
    The per-cell quota is 2x the uniform share, so dense cells can lend
    surplus to empty ones in the global pass — the TPU-shaped analogue of
    the reference's bucketed detection grid.

    lax.top_k over full-resolution cells is the dominant detection cost
    on TPU (measured ~1 ms/image); so the candidate set is first reduced
    by a (block x block) max+argmax — a reshape + VPU reduction. After
    NMS (radius >= block/2 - 1) a block rarely holds more than one
    surviving maximum, so the reduction is near-lossless while shrinking
    the sort input by block^2.
    """
    H, W = score.shape
    n_cells = grid_rows * grid_cols
    # cell dims, rounded up to multiples of the reduction block
    cell_h = -(-(-(-H // grid_rows)) // block) * block
    cell_w = -(-(-(-W // grid_cols)) // block) * block
    sp = jnp.pad(score, ((0, cell_h * grid_rows - H),
                         (0, cell_w * grid_cols - W)),
                 constant_values=-jnp.inf)
    Hp, Wp = sp.shape
    nbh, nbw = cell_h // block, cell_w // block

    # block max + argmax WITHOUT transposing the full-resolution map
    # (the former (cells, nblocks, block^2) 6-axis transpose was the
    # dominant detection cost on TPU — a layout-hostile full-res copy):
    # lane-group reduce (pure reshape, W stays contiguous), then
    # sublane-group reduce (strided axis-1 reduce), then the within-
    # block row position recovered by an 8-term one-hot combine.
    v1 = sp.reshape(Hp, Wp // block, block)
    rmax = jnp.max(v1, axis=-1)                          # (Hp, Wb)
    rarg = jnp.argmax(v1, axis=-1).astype(jnp.int32)     # lane within block
    v2 = rmax.reshape(Hp // block, block, Wp // block)
    bs_g = jnp.max(v2, axis=1)                           # (Hb, Wb)
    brow = jnp.argmax(v2, axis=1).astype(jnp.int32)      # row within block
    rarg3 = rarg.reshape(Hp // block, block, Wp // block)
    bcol = jnp.zeros_like(brow)
    for r in range(block):
        bcol = jnp.where(brow == r, rarg3[:, r, :], bcol)
    bi_g = brow * block + bcol                           # pos within block

    # group blocks into detection-grid cells (small arrays from here on)
    def cellify(a):
        c = a.reshape(grid_rows, nbh, grid_cols, nbw)
        return c.transpose(0, 2, 1, 3).reshape(n_cells, nbh * nbw)

    bs = cellify(bs_g)
    bi = cellify(bi_g)
    q = min(max(2 * k_total // n_cells, 1), nbh * nbw)
    cs, ci = lax.top_k(bs, q)                          # (cells, q) blocks
    inner = jnp.take_along_axis(bi, ci, axis=1)        # (cells, q)
    # reconstruct padded-image coordinates
    cell_r = jnp.arange(n_cells, dtype=jnp.int32) // grid_cols
    cell_c = jnp.arange(n_cells, dtype=jnp.int32) % grid_cols
    iy = (cell_r * cell_h)[:, None] + (ci // nbw) * block + inner // block
    ix = (cell_c * cell_w)[:, None] + (ci % nbw) * block + inner % block
    flat_s = cs.reshape(-1)
    flat_y = iy.reshape(-1)
    flat_x = ix.reshape(-1)
    k = min(k_total, flat_s.shape[0])
    ts, ti = lax.top_k(flat_s, k)
    uv = jnp.stack([jnp.take(flat_x, ti), jnp.take(flat_y, ti)],
                   axis=-1).astype(jnp.float32)
    valid = ts > 0.0
    if k < k_total:
        pad = k_total - k
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        ts = jnp.pad(ts, (0, pad), constant_values=-jnp.inf)
        valid = jnp.pad(valid, (0, pad))
    return uv, ts, valid


def detect_fast(img: jnp.ndarray, k_total: int, th: float, th_min: float,
                adaptive: bool, nms_radius: int, grid_rows: int, grid_cols: int,
                border: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full FAST stage on one pyramid level -> (uv, score, valid), fixed K.

    Adaptive thresholding (ref config ``adaptative_fast``): both the main
    and the fallback threshold masks are computed in the same pass; the
    low-threshold map is used only when the high one yields fewer than
    k_total/2 corners — a masked select, not a re-run.
    """
    corner_hi, corner_lo, score = fast_score_map2(
        img, th, th_min if adaptive else th)
    H, W = img.shape
    by = (jnp.arange(H) >= border) & (jnp.arange(H) < H - border)
    bx = (jnp.arange(W) >= border) & (jnp.arange(W) < W - border)
    inb = by[:, None] & bx[None, :]
    keep = nms(score, nms_radius) & inb

    s_hi = jnp.where(corner_hi & keep, score, 0.0)
    if adaptive:
        s_lo = jnp.where(corner_lo & keep, score, 0.0)
        enough = jnp.sum(s_hi > 0) >= (k_total // 2)
        s_final = jnp.where(enough, s_hi, s_lo)
    else:
        s_final = s_hi
    return select_topk_grid(s_final, k_total, grid_rows, grid_cols)
