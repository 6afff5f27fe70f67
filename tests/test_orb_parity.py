"""Numerical pinning tests for the ORB descriptor hot path.

This exact path regressed 1.8x in round 3 (serialized XLA while-loop)
and was rewritten again in round 4 (one-hot rotated-offset table + one
flat 64-wide gather) — it has earned a committed guard. Three layers:

  1. STRUCTURAL bit-exactness: given the angles the kernel itself
     computed, an index-by-index numpy replay of the rotated-pool
     gather + pair comparisons must reproduce every descriptor bit.
     This pins the one-hot offset matmul, the flat multi-level index
     arithmetic, the clipping, and the MXU pair-difference matmul —
     the parts the round-3/4 rewrites changed.
  2. Orientation parity: an independent numpy implementation of the
     half-res moment-map orientation (edge-replicated separable
     correlation + bilinear resize, written as direct loops, not
     matmuls) must agree with the kernel's angles.
  3. End-to-end: descriptors recomputed fully from the numpy side
     (numpy orientations -> bins -> gather -> pairs) agree on ~all
     bits; disagreements are only ever keypoints whose angle sits on
     a discretization-bin boundary.

Reference parity: cv::ORB's describe stage used by stvo-pl
``src/stereoFrame.cpp :: detectPointFeatures`` (see ops/orb.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.ops import orb
from plslam_tpu.ops.orb import (N_ANGLE_BINS, N_POOL, PAIRS, PATCH_HALF,
                                _ROT_TABLES, describe_multilevel)


# ---------------------------------------------------------------- helpers
def _np_sepfilter(img, kx, ky):
    """Edge-replicated separable correlation, direct shifted adds."""
    H, W = img.shape
    ry, rx = len(ky) // 2, len(kx) // 2
    p = np.pad(img, ((ry, ry), (0, 0)), mode="edge")
    tmp = np.zeros((H, W), np.float64)
    for j, kv in enumerate(ky):
        tmp += kv * p[j:j + H, :]
    p = np.pad(tmp, ((0, 0), (rx, rx)), mode="edge")
    out = np.zeros((H, W), np.float64)
    for j, kv in enumerate(kx):
        out += kv * p[:, j:j + W]
    return out


def _np_resize_half(img):
    """Bilinear resize to (H//2, W//2), align_corners=False sampling
    (matches ops.image.resize_bilinear's convention)."""
    H, W = img.shape
    Ho, Wo = H // 2, W // 2

    def axis_matrix(n_out, n_in):
        M = np.zeros((n_out, n_in), np.float64)
        scale = n_in / n_out
        for i in range(n_out):
            x = (i + 0.5) * scale - 0.5
            x0 = int(np.floor(x))
            f = x - x0
            M[i, min(max(x0, 0), n_in - 1)] += 1.0 - f
            M[i, min(max(x0 + 1, 0), n_in - 1)] += f
        return M

    return axis_matrix(Ho, H) @ img @ axis_matrix(Wo, W).T


def _np_orientations(levels_np, uv, octave):
    """Independent numpy replay of the half-res centroid orientation."""
    d_h = np.arange(-(PATCH_HALF // 2), PATCH_HALF // 2 + 1, dtype=np.float64)
    ones_h = np.ones_like(d_h)
    half_maps = []
    for lvl in levels_np:
        half = _np_resize_half(lvl.astype(np.float64))
        m10 = _np_sepfilter(half, d_h, ones_h)   # kx weights columns
        m01 = _np_sepfilter(half, ones_h, d_h)
        half_maps.append((m10, m01))
    thetas = np.empty(len(uv), np.float64)
    for k, ((u, v), o) in enumerate(zip(uv, octave)):
        o = min(max(int(o), 0), len(levels_np) - 1)
        m10, m01 = half_maps[o]
        Hs, Ws = m10.shape
        u2 = min(max(int(np.round(u * 0.5)), 0), Ws - 1)
        v2 = min(max(int(np.round(v * 0.5)), 0), Hs - 1)
        thetas[k] = np.arctan2(m01[v2, u2], m10[v2, u2])
    return thetas


def _np_bits_from_theta(levels_np, uv, octave, theta):
    """Rotated-pool gather + pair comparisons, index-by-index."""
    K = len(uv)
    bits = np.zeros((K, 256), np.uint8)
    for k in range(K):
        o = min(max(int(octave[k]), 0), len(levels_np) - 1)
        lvl = levels_np[o]
        H, W = lvl.shape
        b = int(np.mod(np.round(theta[k] * (N_ANGLE_BINS / (2 * np.pi))),
                       N_ANGLE_BINS))
        dy = _ROT_TABLES[b, :, 0]
        dx = _ROT_TABLES[b, :, 1]
        u = min(max(int(np.round(uv[k, 0])), PATCH_HALF), W - 1 - PATCH_HALF)
        v = min(max(int(np.round(uv[k, 1])), PATCH_HALF), H - 1 - PATCH_HALF)
        pool = lvl[v + dy, u + dx].astype(np.float32)
        for j, (p0, p1) in enumerate(PAIRS):
            bits[k, j] = 1 if (pool[p1] - pool[p0]) > 0 else 0
    return bits


def _make_case(seed=0, n_lvl=4, K=96, H=96, W=128):
    rng = np.random.default_rng(seed)
    levels_np = []
    h, w = H, W
    for _ in range(n_lvl):
        levels_np.append(rng.random((h, w)).astype(np.float32))
        h, w = int(h / 1.2), int(w / 1.2)
    octave = rng.integers(0, n_lvl, K).astype(np.int32)
    uv = np.empty((K, 2), np.float32)
    for k in range(K):
        lh, lw = levels_np[octave[k]].shape
        uv[k, 0] = rng.uniform(0, lw - 1)
        uv[k, 1] = rng.uniform(0, lh - 1)
    return levels_np, uv, octave


# ------------------------------------------------------------------ tests
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_describe_multilevel_gather_bit_exact(seed):
    """Layer 1: replaying the gather with the kernel's OWN angles must
    be bit-exact — any regression in the offset table selection, the
    flat index math, or the pair matmul flips bits here."""
    levels_np, uv, octave = _make_case(seed)
    levels = [jnp.asarray(l) for l in levels_np]
    desc, theta = describe_multilevel(levels, jnp.asarray(uv),
                                      jnp.asarray(octave))
    desc = np.asarray(desc)
    theta = np.asarray(theta, np.float64)
    ref = _np_bits_from_theta(levels_np, uv, octave, theta)
    # exact ties (pool[p1] == pool[p0]) are the only legal divergence;
    # random float images make them measure-zero
    assert np.array_equal(desc, ref), (
        f"{(desc != ref).sum()} / {desc.size} descriptor bits diverge "
        "from the index-by-index replay")


def test_describe_multilevel_orientation_parity():
    """Layer 2: the half-res moment-map angles vs an independent direct
    correlation implementation."""
    levels_np, uv, octave = _make_case(seed=3)
    levels = [jnp.asarray(l) for l in levels_np]
    _, theta = describe_multilevel(levels, jnp.asarray(uv),
                                   jnp.asarray(octave))
    theta = np.asarray(theta, np.float64)
    ref = _np_orientations(levels_np, uv, octave)
    d = np.abs(np.angle(np.exp(1j * (theta - ref))))
    assert np.max(d) < 1e-3, f"max angle error {np.max(d):.2e} rad"


def test_describe_multilevel_end_to_end_parity():
    """Layer 3: fully independent reference descriptors. Bit mismatches
    may only come from keypoints whose angle is within float noise of a
    32-bin discretization boundary."""
    levels_np, uv, octave = _make_case(seed=4, K=128)
    levels = [jnp.asarray(l) for l in levels_np]
    desc, _ = describe_multilevel(levels, jnp.asarray(uv),
                                  jnp.asarray(octave))
    desc = np.asarray(desc)
    theta_ref = _np_orientations(levels_np, uv, octave)
    ref = _np_bits_from_theta(levels_np, uv, octave, theta_ref)
    per_kp_equal = (desc == ref).all(axis=1)
    # keypoints near a bin boundary may legally land in the adjacent bin
    frac = theta_ref * (N_ANGLE_BINS / (2 * np.pi))
    near_boundary = np.abs(frac - np.round(frac) - 0.0) > 0.5 - 1e-3
    bad = ~per_kp_equal & ~near_boundary
    assert not bad.any(), (
        f"{bad.sum()} keypoints diverge away from bin boundaries")
    assert per_kp_equal.mean() > 0.95


def test_single_level_describe_matches_multilevel():
    """The single-level ``describe`` and the fused multi-level path must
    produce identical descriptors for octave-0 keypoints."""
    levels_np, uv, octave = _make_case(seed=5, n_lvl=1, K=64)
    img = jnp.asarray(levels_np[0])
    d1, th1 = orb.describe(img, jnp.asarray(uv))
    d2, th2 = describe_multilevel([img], jnp.asarray(uv),
                                  jnp.asarray(np.zeros(64, np.int32)))
    assert np.allclose(np.asarray(th1), np.asarray(th2), atol=1e-5)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
