"""Line-segment detection, TPU-shaped (LSD-equivalent).

Reference parity: the vendored line_descriptor module's ``LSDDetector``
(pl-slam 3rdparty; scale-space region growing on gradient orientation)
used by stvo-pl ``src/stereoFrame.cpp :: detectLineFeatures``.

LSD's sequential region-growing cannot map to the TPU. Following
SURVEY.md §7.2, this is a bounded-recall reformulation with identical
downstream contract (segments + angles + strengths):

  1. Sobel gradients; per-pixel support weight = |g| where |g| > th.
  2. Overlapping tiles (size T, stride T/2). For every tile at once
     (reduce_window sums, no loops): weighted position moments ->
     principal axis of the support's position covariance = candidate
     direction; gates on support mass, elongation (sqrt(l_par/l_perp)),
     perpendicular spread, and gradient-normal coherence (mean gradient
     must align with the candidate normal, LSD's level-line criterion).
  3. Collinear merge across tiles: iterative min-label propagation on
     the tile grid (vectorized connected components where edges exist
     between neighboring tiles with compatible direction/offset), then
     per-label moment scatter-adds re-fit the merged line and min/max
     projections give endpoints.
  4. Top max_lines by support mass, fixed capacity + valid mask.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.ops.gather import take_mxu
from plslam_tpu.ops.image import sobel_gradients


class Segments(NamedTuple):
    sp: jnp.ndarray      # (N, 2) x,y
    ep: jnp.ndarray      # (N, 2)
    angle: jnp.ndarray   # (N,) direction angle in [-pi/2, pi/2)
    score: jnp.ndarray   # (N,) support mass
    valid: jnp.ndarray   # (N,) bool


def _tile_sums(x: jnp.ndarray, tile: int, stride: int) -> jnp.ndarray:
    """Sum of x over (tile x tile) windows at the given stride."""
    return lax.reduce_window(x, 0.0, lax.add, (tile, tile), (stride, stride),
                             "VALID")


@lru_cache(maxsize=64)
def _blocksum_matrices(n: int, stride: int) -> np.ndarray:
    """(3, nb, n) stack of block-sum row operators: plain 0/1 block sum,
    BLOCK-LOCAL-coordinate-weighted, and local-coordinate^2-weighted.
    nb = ceil(n/stride).

    Local coordinates (j - i*stride, in [0, stride)) keep the moment
    magnitudes ~stride^2 instead of ~n^2: with absolute pixel
    coordinates the centered variances (signal ~0.2 px^2 for a thin
    line) cancel against ~1e6-scale squared sums and drown in f32
    rounding (~1 px^2 of noise) — measured to reject most genuine line
    tiles. Window sums shift origins exactly via the parallel-axis
    relations in tile_moment_maps."""
    nb = -(-n // stride)
    R = np.zeros((3, nb, n), np.float32)
    for i in range(nb):
        j = np.arange(i * stride, min((i + 1) * stride, n))
        loc = (j - i * stride).astype(np.float32)
        R[0, i, j] = 1.0
        R[1, i, j] = loc
        R[2, i, j] = loc * loc
    return R


def _dot_hi(a, b):
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def tile_moment_maps(w: jnp.ndarray, d2x: jnp.ndarray, d2y: jnp.ndarray,
                     tile: int, stride: int):
    """All eight (Th, Tw) tile-sum maps of the LSD-equivalent detector in
    one separable MXU pass, in WINDOW-LOCAL coordinates.

    Equivalent to eight overlapping ``reduce_window`` calls over the
    full-resolution product planes — but the coordinate weights are
    folded into banded block-sum matrices, so only THREE full-resolution
    planes are ever read and every reduction is a matmul: rows first
    ((Th', H) @ (H, W)), then columns. Overlapping (tile x tile, stride)
    windows are the sum of the 2x2 adjacent (stride x stride) block
    sums, origin-shifted exactly by the parallel-axis relations
    (tile == 2*stride).

    Coordinates are LOCAL to each window's top-left corner (see
    _blocksum_matrices: f32 cancellation with absolute coordinates
    destroys the centered second moments). Callers convert centroids to
    image coordinates by adding (j*stride, i*stride).

    Returns (S, Sx, Sy, Sxx, Syy, Sxy, D2x, D2y), each (Th, Tw), where
    Sx = sum w*(x - x0_window) etc.
    """
    assert tile == 2 * stride
    H, W = w.shape
    Ry = jnp.asarray(_blocksum_matrices(H, stride))    # (3, Hb, H)
    Cx = jnp.asarray(_blocksum_matrices(W, stride))    # (3, Wb, W)

    # row stage: one matmul over the 3-plane concat + 2 coord-weighted
    cat = jnp.concatenate([w, d2x, d2y], axis=1)       # (H, 3W)
    r0 = _dot_hi(Ry[0], cat)                           # (Hb, 3W)
    Aw, Ad2x, Ad2y = r0[:, :W], r0[:, W:2 * W], r0[:, 2 * W:]
    By = _dot_hi(Ry[1], w)                             # (Hb, W) sum y'*w
    Cyy = _dot_hi(Ry[2], w)                            # (Hb, W) sum y'^2*w

    # column stage
    C0, C1, C2 = Cx[0], Cx[1], Cx[2]
    s_sx_sxx = _dot_hi(Aw, jnp.concatenate([C0, C1, C2], axis=0).T)
    Wb = C0.shape[0]
    S8, Sx8, Sxx8 = (s_sx_sxx[:, :Wb], s_sx_sxx[:, Wb:2 * Wb],
                     s_sx_sxx[:, 2 * Wb:])
    sy_sxy = _dot_hi(By, jnp.concatenate([C0, C1], axis=0).T)
    Sy8, Sxy8 = sy_sxy[:, :Wb], sy_sxy[:, Wb:]
    rest = _dot_hi(jnp.concatenate([Cyy, Ad2x, Ad2y], axis=0), C0.T)
    Hb = Aw.shape[0]
    Syy8, D2x8, D2y8 = rest[:Hb], rest[Hb:2 * Hb], rest[2 * Hb:]

    # overlapping (2s x 2s, stride s) windows = 2x2 adjacent block sums
    # with exact origin shifts, cropped to reduce_window-VALID extent.
    # Block (bi+di, bj+dj) contributes with its local origin displaced by
    # (di*s, dj*s) from the window origin:
    #   Sx  -> Sx + dx*S                 Sxx -> Sxx + 2*dx*Sx + dx^2*S
    #   Sxy -> Sxy + dy*Sx + dx*Sy + dx*dy*S
    Th = (H - tile) // stride + 1
    Tw = (W - tile) // stride + 1
    s = float(stride)

    def sh(m, di, dj):
        """Block map shifted so (i, j) reads block (i+di, j+dj)."""
        return m[di:m.shape[0] - 1 + di, dj:m.shape[1] - 1 + dj]

    def window(moment_fn):
        out = None
        for di in (0, 1):
            for dj in (0, 1):
                term = moment_fn(di * s, dj * s,
                                 lambda m: sh(m, di, dj))
                out = term if out is None else out + term
        return out[:Th, :Tw]

    S = window(lambda dy, dx, g: g(S8))
    Sx = window(lambda dy, dx, g: g(Sx8) + dx * g(S8))
    Sy = window(lambda dy, dx, g: g(Sy8) + dy * g(S8))
    Sxx = window(lambda dy, dx, g: g(Sxx8) + 2.0 * dx * g(Sx8)
                 + dx * dx * g(S8))
    Syy = window(lambda dy, dx, g: g(Syy8) + 2.0 * dy * g(Sy8)
                 + dy * dy * g(S8))
    Sxy = window(lambda dy, dx, g: g(Sxy8) + dy * g(Sx8) + dx * g(Sy8)
                 + dx * dy * g(S8))
    D2x = window(lambda dy, dx, g: g(D2x8))
    D2y = window(lambda dy, dx, g: g(D2y8))
    return S, Sx, Sy, Sxx, Syy, Sxy, D2x, D2y


def orientation_maps(d2x: jnp.ndarray, d2y: jnp.ndarray, tile: int,
                     stride: int):
    """Window sums of ONLY the double-angle orientation planes.

    The level-line reweighting pass needs just (D2x, D2y) per tile; the
    full tile_moment_maps also assembles six position-moment maps whose
    matmuls are pure waste in that pass (~the whole row/column stage for
    the coordinate-weighted operators). Returns (D2x, D2y), each
    (Th, Tw), identical to tile_moment_maps' last two outputs.
    """
    assert tile == 2 * stride
    H, W = d2x.shape
    Ry0 = jnp.asarray(_blocksum_matrices(H, stride))[0]
    Cx0 = jnp.asarray(_blocksum_matrices(W, stride))[0]
    cat = jnp.concatenate([d2x, d2y], axis=1)          # (H, 2W)
    r0 = _dot_hi(Ry0, cat)                             # (Hb, 2W)
    blocks = _dot_hi(jnp.concatenate([r0[:, :W], r0[:, W:]], axis=0), Cx0.T)
    Hb = r0.shape[0]
    D2x8, D2y8 = blocks[:Hb], blocks[Hb:]
    Th = (H - tile) // stride + 1
    Tw = (W - tile) // stride + 1

    def window(m):
        return (m[:-1, :-1] + m[:-1, 1:] + m[1:, :-1]
                + m[1:, 1:])[:Th, :Tw]

    return window(D2x8), window(D2y8)


def _principal_axis(sxx, syy, sxy):
    """Closed-form eigen-decomposition of [[sxx, sxy], [sxy, syy]].

    Returns (l1, l2, nx, ny) with l1 >= l2 and (nx, ny) the unit
    eigenvector of l1.
    """
    tr = sxx + syy
    diff = sxx - syy
    disc = jnp.sqrt(diff * diff + 4.0 * sxy * sxy + 1e-20)
    l1 = 0.5 * (tr + disc)
    l2 = 0.5 * (tr - disc)
    # eigenvector for l1: (sxy, l1 - sxx) unless degenerate
    vx = jnp.where(jnp.abs(sxy) > 1e-12, sxy, l1 - syy)
    vy = jnp.where(jnp.abs(sxy) > 1e-12, l1 - sxx, jnp.zeros_like(sxy) + 1e-12)
    n = jnp.sqrt(vx * vx + vy * vy + 1e-20)
    return l1, l2, vx / n, vy / n


def merge_segments(sp: jnp.ndarray, ep: jnp.ndarray, score: jnp.ndarray,
                   valid: jnp.ndarray, ang_th: float, dist_th: float,
                   gap_th: float, iters: int = 8):
    """Collinear segment-level merge: fuse fragments of the same line
    that the tile-chain stage left disconnected (gaps from occlusions —
    e.g. textures/objects crossing the line — or locally failed tiles).

    The reference's LSD grows dense support regions and rarely
    fragments; this second stage restores that behavior for the
    tile-based detector (uses the ``merge_gap_th`` config the reference
    exposes for its line-merging option).

    Fully vectorized on (M, M) matrices (M = segment capacity, ~256):
    compatibility = angle mod pi within ang_th AND mutual perpendicular
    midpoint offset within dist_th AND projection-interval gap within
    gap_th; connected components by iterated masked label-min (no
    gathers); per-root refit via one-hot matmul aggregation.

    Returns (sp, ep, angle, score, valid) with merged segments living in
    their root slots (members' slots invalidated).
    """
    M = sp.shape[0]
    mid = 0.5 * (sp + ep)
    d = ep - sp
    length = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    du = d / length[:, None]
    # canonical hemisphere so fragment directions agree
    flip = du[:, 0] < 0
    du = jnp.where(flip[:, None], -du, du)
    ang = jnp.arctan2(du[:, 1], du[:, 0])

    dang = jnp.abs(ang[:, None] - ang[None, :])
    dang = jnp.minimum(dang, jnp.pi - dang)
    # perpendicular offset of j's midpoint from i's infinite line
    n = jnp.stack([-du[:, 1], du[:, 0]], axis=-1)          # (M, 2)
    rel = mid[None, :, :] - mid[:, None, :]                # (M, M, 2)
    off = jnp.abs(jnp.einsum("ik,ijk->ij", n, rel))
    # projection intervals of both segments on i's direction
    pm = jnp.einsum("ik,ijk->ij", du, rel)                 # center of j on i
    half_j = 0.5 * length[None, :]
    half_i = 0.5 * length[:, None]
    gap = jnp.abs(pm) - (half_i + half_j)                  # <0 = overlap
    ok = ((dang < ang_th) & (off < dist_th) & (gap < gap_th)
          & valid[:, None] & valid[None, :])
    ok = ok & ok.T

    lab0 = jnp.where(valid, jnp.arange(M, dtype=jnp.int32), jnp.int32(M))

    def prop(_, lab):
        cand = jnp.where(ok, lab[None, :], M)
        lab = jnp.minimum(lab, jnp.min(cand, axis=1))
        # pointer-jumping hop (lab <- lab[lab]): collinear chains collapse
        # to their root in O(log M) passes instead of one hop per pass —
        # without it a chain longer than ``iters`` fragments leaves two+
        # overlapping merged segments that both survive top-k and can
        # double-match downstream
        return jnp.minimum(lab, lab[jnp.clip(lab, 0, M - 1)])

    lab = lax.fori_loop(0, iters, prop, lab0)

    # one-hot root aggregation (root slot r collects its members)
    R = (lab[None, :] == jnp.arange(M, dtype=jnp.int32)[:, None])
    Rf = R.astype(jnp.float32) * valid[None, :].astype(jnp.float32)
    w = jnp.where(valid, score, 0.0)
    wsum = Rf @ w
    # support-weighted double-angle mean direction
    c2 = Rf @ (w * jnp.cos(2.0 * ang))
    s2 = Rf @ (w * jnp.sin(2.0 * ang))
    ang_m = 0.5 * jnp.arctan2(s2, c2)
    dm = jnp.stack([jnp.cos(ang_m), jnp.sin(ang_m)], axis=-1)
    cen = (Rf @ (w[:, None] * mid)) / jnp.maximum(wsum, 1e-6)[:, None]
    # endpoints: min/max projection of member endpoints on the root line
    proj_sp = jnp.einsum("rk,jk->rj", dm, sp) - jnp.sum(dm * cen, -1)[:, None]
    proj_ep = jnp.einsum("rk,jk->rj", dm, ep) - jnp.sum(dm * cen, -1)[:, None]
    INF = jnp.float32(1e9)
    lo = jnp.minimum(jnp.where(Rf > 0, proj_sp, INF),
                     jnp.where(Rf > 0, proj_ep, INF)).min(axis=1)
    hi = jnp.maximum(jnp.where(Rf > 0, proj_sp, -INF),
                     jnp.where(Rf > 0, proj_ep, -INF)).max(axis=1)
    is_root = valid & (lab == jnp.arange(M, dtype=jnp.int32)) & (wsum > 0)
    sp_m = cen + lo[:, None] * dm
    ep_m = cen + hi[:, None] * dm
    return sp_m, ep_m, ang_m, jnp.where(is_root, wsum, 0.0), is_root


class TileStage(NamedTuple):
    """Intermediate state between the tile-labeling stage and the
    per-label refit — exposed so tests can pin the compact-root-space
    refit against a full-membership reference on the same label field
    (the refit math was rewritten in round 4; see tests/test_line_refit
    _parity.py)."""
    labels: jnp.ndarray    # (Th, Tw) int32 connected-component labels
    tile_ok: jnp.ndarray   # (Th, Tw) bool gate survivors
    S: jnp.ndarray         # (Th, Tw) support mass
    Sx: jnp.ndarray        # window-LOCAL first/second moments
    Sy: jnp.ndarray
    Sxx: jnp.ndarray
    Syy: jnp.ndarray
    Sxy: jnp.ndarray
    cx: jnp.ndarray        # (Th, Tw) centroids, IMAGE coordinates
    cy: jnp.ndarray
    cx_l: jnp.ndarray      # centroids, window-LOCAL coordinates
    cy_l: jnp.ndarray
    l1: jnp.ndarray        # (Th, Tw) major eigenvalue (tile extent)


def tile_stage(img: jnp.ndarray, tile: int = 16,
               grad_th: float = 0.02, min_support: float = 1.0,
               elong_th: float = 2.5, perp_spread_th: float = 2.2,
               coherence_th: float = 0.6, merge_iters: int = 8,
               merge_ang_th: float = 0.1,
               merge_dist_th: float = 2.0) -> TileStage:
    """Stages 1-3 of the detector: gradients, gated tile moments,
    connected-component labels (see module docstring)."""
    H, W = img.shape
    stride = tile // 2
    gx, gy = sobel_gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    w = jnp.where(mag > grad_th, mag, 0.0)

    # first/second weighted position moments + gradient means, all tiles.
    # Double-angle gradient-orientation statistics: a thin ridge has
    # anti-parallel gradients on its two flanks, which agree mod pi —
    # t = (gx^2 - gy^2, 2 gx gy) / |g| is the magnitude-weighted unit
    # double-angle vector, so |sum t| / sum |g| measures orientation
    # coherence without the cancellation.
    mag_safe = jnp.maximum(mag, 1e-9)
    d2x = jnp.where(w > 0, (gx * gx - gy * gy) / mag_safe, 0.0)
    d2y = jnp.where(w > 0, 2.0 * gx * gy / mag_safe, 0.0)
    # pass 1 only feeds the level-line reweighting below, which reads
    # nothing but the per-tile dominant orientation — so only the two
    # double-angle window sums are assembled (orientation_maps), not the
    # six position moments
    D2x, D2y = orientation_maps(d2x, d2y, tile, stride)

    # ---- level-line filtering (LSD's region-orientation test, tile-wise):
    # pass 2 recomputes the moments with each pixel reweighted by how
    # well its gradient orientation agrees (mod pi) with the LOCALLY
    # dominant orientation. In tiles mixing a thin line with clutter
    # (textures, corners), isotropic clutter cancels in the double-angle
    # mean while the line's two coherent flanks reinforce it — so the
    # reweighting suppresses the clutter mass that otherwise inflates
    # the perpendicular spread and fails the gates (measured: most
    # genuine line tiles near texture were rejected without this).
    d2n = jnp.sqrt(D2x * D2x + D2y * D2y) + 1e-9
    u2x, u2y = D2x / d2n, D2y / d2n                 # (Th, Tw) unit field
    Th0, Tw0 = u2x.shape

    def up(m):
        # nearest upsample as broadcast+reshape (jnp.repeat materializes
        # a gather on TPU; a broadcast fuses into the consumers)
        full = jnp.broadcast_to(m[:, None, :, None],
                                (Th0, stride, Tw0, stride)
                                ).reshape(Th0 * stride, Tw0 * stride)
        return jnp.pad(full, ((stride // 2, H - Th0 * stride - stride // 2),
                              (stride // 2, W - Tw0 * stride - stride // 2)),
                       mode="edge")

    align_px = (d2x * up(u2x) + d2y * up(u2y)) / jnp.maximum(w, 1e-9)
    ratio = jnp.square(jnp.maximum(align_px, 0.0))
    S, Sx, Sy, Sxx, Syy, Sxy, D2x, D2y = tile_moment_maps(
        w * ratio, d2x * ratio, d2y * ratio, tile, stride)

    Th, Tw = S.shape
    S_safe = jnp.maximum(S, 1e-6)
    # centroids/covariance in window-LOCAL coordinates (exact in f32),
    # then centroids shifted to image coordinates by the window origins
    cx_l = Sx / S_safe
    cy_l = Sy / S_safe
    cxx = Sxx / S_safe - cx_l * cx_l
    cyy = Syy / S_safe - cy_l * cy_l
    cxy = Sxy / S_safe - cx_l * cy_l
    cx = cx_l + stride * jax.lax.broadcasted_iota(jnp.float32, (Th, Tw), 1)
    cy = cy_l + stride * jax.lax.broadcasted_iota(jnp.float32, (Th, Tw), 0)
    l1, l2, dx, dy = _principal_axis(cxx, cyy, cxy)
    l1 = jnp.maximum(l1, 0.0)
    l2 = jnp.maximum(l2, 0.0)

    elong = jnp.sqrt(l1 / jnp.maximum(l2, 1e-4))
    perp_spread = jnp.sqrt(l2)
    # orientation coherence (mod pi) and alignment of the dominant
    # gradient orientation with the candidate normal: the double angle of
    # the normal is (nx, ny) doubled -> (nx^2 - ny^2, 2 nx ny) with
    # (nx, ny) = (-dy, dx).
    coher = jnp.sqrt(D2x * D2x + D2y * D2y) / S_safe
    nx, ny = -dy, dx
    n2x = nx * nx - ny * ny
    n2y = 2.0 * nx * ny
    align = (D2x * n2x + D2y * n2y) / jnp.maximum(
        jnp.sqrt(D2x * D2x + D2y * D2y), 1e-6)
    tile_ok = ((S > min_support * tile)
               & (elong > elong_th)
               & (perp_spread < perp_spread_th)
               & (coher > coherence_th)
               & (align > coherence_th))

    # canonical direction (dx > 0 hemisphere) so collinear tiles agree
    flip = dx < 0
    dx = jnp.where(flip, -dx, dx)
    dy = jnp.where(flip, -dy, dy)
    angle = jnp.arctan2(dy, dx)                          # [-pi/2, pi/2]

    # ---- collinear connected components over the tile grid --------------
    # labels start as flat tile index; propagate min label along links to
    # the 8 neighbors that are compatible (both valid, similar angle,
    # small perpendicular offset of centroids).
    idx0 = jnp.arange(Th * Tw, dtype=jnp.int32).reshape(Th, Tw)
    BIG = jnp.int32(Th * Tw + 7)
    labels = jnp.where(tile_ok, idx0, BIG)

    def _shift_pad(a, di, dj, fill):
        out = jnp.full_like(a, fill)
        src_i = slice(max(di, 0), Th + min(di, 0))
        dst_i = slice(max(-di, 0), Th + min(-di, 0))
        src_j = slice(max(dj, 0), Tw + min(dj, 0))
        dst_j = slice(max(-dj, 0), Tw + min(-dj, 0))
        return out.at[dst_i, dst_j].set(a[src_i, src_j])

    neigh = [(0, 1), (1, 0), (1, 1), (1, -1)]

    def compatible(di, dj):
        ok_n = _shift_pad(tile_ok, di, dj, False)
        ang_n = _shift_pad(angle, di, dj, 0.0)
        cx_n = _shift_pad(cx, di, dj, 0.0)
        cy_n = _shift_pad(cy, di, dj, 0.0)
        dang = jnp.abs(angle - ang_n)
        dang = jnp.minimum(dang, jnp.pi - dang)
        # perpendicular offset of the neighbor centroid from our line
        off = jnp.abs(-dy * (cx_n - cx) + dx * (cy_n - cy))
        return tile_ok & ok_n & (dang < merge_ang_th) & (off < merge_dist_th)

    comp = {d: compatible(*d) for d in neigh}

    def prop(_, lab):
        new = lab
        for (di, dj) in neigh:
            lab_n = _shift_pad(lab, di, dj, BIG)
            new = jnp.where(comp[(di, dj)], jnp.minimum(new, lab_n), new)
            # reverse direction
            lab_p = _shift_pad(lab, -di, -dj, BIG)
            ok_rev = _shift_pad(comp[(di, dj)], -di, -dj, False)
            new = jnp.where(ok_rev, jnp.minimum(new, lab_p), new)
        # pointer jumping: a label is itself a tile index, so following it
        # one hop (label <- label[label]) doubles the propagation reach;
        # merge_iters iterations cover chains of ~2^merge_iters tiles.
        # The hop is an arbitrary 7k-element gather — executed as a
        # one-hot MXU contraction (take_mxu): the native TPU gather
        # serializes per index and dominated the whole detector.
        flatl = new.reshape(-1)
        tgt = jnp.where(flatl < Th * Tw, flatl, 0)
        hopped = jnp.where(flatl < Th * Tw,
                           jnp.minimum(flatl, take_mxu(flatl, tgt)), flatl)
        return hopped.reshape(Th, Tw)

    labels = lax.fori_loop(0, merge_iters, prop, labels)
    return TileStage(labels=labels, tile_ok=tile_ok, S=S, Sx=Sx, Sy=Sy,
                     Sxx=Sxx, Syy=Syy, Sxy=Sxy, cx=cx, cy=cy,
                     cx_l=cx_l, cy_l=cy_l, l1=l1)


def refit_roots(ts: TileStage, H: int, W: int, tile: int,
                max_lines: int, min_length: float):
    """Per-label refit of the tile components into candidate segments.

    Returns (sp (R', 2), ep (R', 2), score (R',)) for the top
    2*max_lines candidates by support mass (score == 0 marks empty
    slots) — the input to the segment-level collinear merge."""
    stride = tile // 2
    Th, Tw = ts.labels.shape
    (S, Sx, Sy, Sxx, Syy, Sxy) = (ts.S, ts.Sx, ts.Sy, ts.Sxx, ts.Syy,
                                  ts.Sxy)
    cx, cy, cx_l, cy_l, l1 = ts.cx, ts.cy, ts.cx_l, ts.cy_l, ts.l1
    tile_ok, labels = ts.tile_ok, ts.labels
    # ---- per-label refit in COMPACT root space -------------------------
    # Only ~hundreds of tiles survive the gates, and at most 2*max_lines
    # merged segments are ever consumed — so the member aggregation runs
    # on (R, n) with R = a root capacity, not (n, n): roots are selected
    # by their own tile mass with top_k, membership is a (R, n) one-hot
    # compare, and every aggregation is an MXU contraction over it.
    # (Full-width alternatives measured: (n,) scatter-adds serialize per
    # index; an (n, n) one-hot materializes a 200 MB pred mask.)
    flat = lambda a: a.reshape(-1)
    lab = flat(labels)
    valid_t = flat(tile_ok)

    # shift per-tile local moments to a shared image-center origin
    # (parallel-axis); centered coords keep the merged sums ~1e5, small
    # enough that the merged principal DIRECTION (large eigengap) is
    # f32-stable even though tiny perp variances are not — the refit
    # never gates on those.
    x0 = 0.5 * W
    y0 = 0.5 * H
    dxc = flat(cx) - flat(cx_l) - x0          # window origin - center
    dyc = flat(cy) - flat(cy_l) - y0
    fS, fSx, fSy = flat(S), flat(Sx), flat(Sy)
    Sx_c = fSx + dxc * fS
    Sy_c = fSy + dyc * fS
    Sxx_c = flat(Sxx) + 2.0 * dxc * fSx + dxc * dxc * fS
    Syy_c = flat(Syy) + 2.0 * dyc * fSy + dyc * dyc * fS
    Sxy_c = flat(Sxy) + dyc * fSx + dxc * fSy + dxc * dyc * fS

    payload = jnp.stack([fS, Sx_c, Sy_c, Sxx_c, Syy_c, Sxy_c,
                         jnp.ones((Th * Tw,), S.dtype)], axis=-1)
    payload = jnp.where(valid_t[:, None], payload, 0.0)

    # root selection: a tile is a root iff it kept its own label; take
    # up to R of them by own-tile support mass (bounded-recall cap — the
    # gates leave O(hundreds) of valid tiles, R = 4*2*max_lines covers
    # them with headroom, and the stage-1 output is capped at
    # 2*max_lines anyway)
    R = min(8 * max_lines, Th * Tw)
    tile_ids = jnp.arange(Th * Tw, dtype=jnp.int32)
    is_root_t = valid_t & (lab == tile_ids)
    r_s, r_ids = lax.top_k(jnp.where(is_root_t, fS, -1.0), R)
    root_id = jnp.where(r_s > 0, jnp.take(tile_ids, r_ids), -1)
    member = (root_id[:, None] == lab[None, :])             # (R, n)
    agg = _dot_hi(member.astype(S.dtype), payload)          # (R, 7)
    mS, mSx, mSy, mSxx, mSyy, mSxy, owns = [agg[:, i] for i in range(7)]
    mS_safe = jnp.maximum(mS, 1e-6)
    mcx = mSx / mS_safe                       # image-center coords
    mcy = mSy / mS_safe
    mcxx = mSxx / mS_safe - mcx * mcx
    mcyy = mSyy / mS_safe - mcy * mcy
    mcxy = mSxy / mS_safe - mcx * mcy
    _, _, mdx, mdy = _principal_axis(mcxx, mcyy, mcxy)

    # endpoints: min/max projection of member tile centroids (+- their
    # own half-extent along the merged direction), as masked reductions
    # over the (R, n) membership
    half_ext = jnp.sqrt(jnp.maximum(12.0 * l1, 0.0)) * 0.5   # per tile
    he = flat(half_ext)
    pc = ((flat(cx) - x0)[None, :] * mdx[:, None]
          + (flat(cy) - y0)[None, :] * mdy[:, None]
          - (mdx * mcx + mdy * mcy)[:, None])               # (R, n)
    INF = jnp.float32(1e9)
    pmin = jnp.min(jnp.where(member, pc - he[None, :], INF), axis=1)
    pmax = jnp.max(jnp.where(member, pc + he[None, :], -INF), axis=1)

    # a root slot is a real segment iff it aggregated support. Stage-1
    # keeps FRAGMENTS down to one tile long (occlusions and locally
    # failed tiles break chains); the segment-level collinear merge
    # below reassembles them, and only merged segments face
    # ``min_length``.
    root_ok = (root_id >= 0) & (mS > 0) & (owns > 0)
    length = jnp.where(root_ok, pmax - pmin, 0.0)
    seg_ok = root_ok & (length > min(0.75 * tile + stride, min_length))

    sp = jnp.stack([mcx + x0 + pmin * mdx, mcy + y0 + pmin * mdy], axis=-1)
    ep = jnp.stack([mcx + x0 + pmax * mdx, mcy + y0 + pmax * mdy], axis=-1)
    score = jnp.where(seg_ok, mS, 0.0)

    # stage-1 top candidates (2x capacity: fragments merge down)
    M1 = 2 * max_lines
    c_s, c_i = lax.top_k(score, M1)
    ctake = lambda a: jnp.take(a, c_i, axis=0)
    return ctake(sp), ctake(ep), c_s


def detect_segments(img: jnp.ndarray, max_lines: int, tile: int = 16,
                    grad_th: float = 0.02, min_support: float = 1.0,
                    elong_th: float = 2.5, perp_spread_th: float = 2.2,
                    coherence_th: float = 0.6, merge_iters: int = 8,
                    merge_ang_th: float = 0.1, merge_dist_th: float = 2.0,
                    merge_gap_th: float = 14.0,
                    min_length: float = 12.0) -> Segments:
    """Detect up to ``max_lines`` segments in one (H, W) image."""
    H, W = img.shape
    ts = tile_stage(img, tile=tile, grad_th=grad_th,
                    min_support=min_support, elong_th=elong_th,
                    perp_spread_th=perp_spread_th,
                    coherence_th=coherence_th, merge_iters=merge_iters,
                    merge_ang_th=merge_ang_th,
                    merge_dist_th=merge_dist_th)
    sp_c, ep_c, c_s = refit_roots(ts, H, W, tile, max_lines, min_length)
    v_c = c_s > 0.0

    sp_m, ep_m, ang_m, score_m, v_m = merge_segments(
        sp_c, ep_c, c_s, v_c, ang_th=2.0 * merge_ang_th,
        dist_th=merge_dist_th, gap_th=merge_gap_th)
    len_m = jnp.sqrt(jnp.sum((ep_m - sp_m) ** 2, axis=-1))
    score_m = jnp.where(v_m & (len_m > min_length), score_m, 0.0)

    top_s, top_i = lax.top_k(score_m, max_lines)
    take = lambda a: jnp.take(a, top_i, axis=0)
    sp_f = jnp.clip(take(sp_m), 0.0, jnp.asarray([W - 1.0, H - 1.0]))
    ep_f = jnp.clip(take(ep_m), 0.0, jnp.asarray([W - 1.0, H - 1.0]))
    return Segments(sp=sp_f, ep=ep_f, angle=take(ang_m), score=top_s,
                    valid=top_s > 0.0)
