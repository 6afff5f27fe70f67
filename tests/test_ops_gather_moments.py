"""Unit tests: MXU one-hot gather, window-local tile moments, and the
segment-level collinear merge (ops/gather.py, ops/lines.py additions)."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from plslam_tpu.ops.gather import take_mxu
from plslam_tpu.ops import lines as OL


def test_take_mxu_matches_native_gather():
    rng = np.random.default_rng(3)
    for n, k in [(7092, 1), (7092, 3), (300, 1), (129, 5), (128, 2)]:
        if k == 1:
            v = rng.normal(size=(n,)).astype(np.float32)
        else:
            v = rng.normal(size=(n, k)).astype(np.float32)
        idx = rng.integers(0, n, 2 * n).astype(np.int32)
        out = np.asarray(take_mxu(jnp.asarray(v), jnp.asarray(idx)))
        np.testing.assert_allclose(out, v[idx], atol=1e-5)


def test_take_mxu_int32_exact():
    """Pointer-jumping relies on int32 labels surviving the f32 matmul
    path exactly."""
    rng = np.random.default_rng(4)
    n = 9000
    v = rng.integers(0, n + 7, n).astype(np.int32)
    idx = rng.integers(0, n, n).astype(np.int32)
    out = np.asarray(take_mxu(jnp.asarray(v), jnp.asarray(idx)))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, v[idx])


def test_take_mxu_int32_exact_large_magnitude():
    """Values at/above 2^24 (and negatives) must round-trip exactly via
    the 16-bit lane split — a plain f32 path would silently round them."""
    rng = np.random.default_rng(5)
    v = rng.integers(-2**31, 2**31 - 1, 4096, dtype=np.int64).astype(np.int32)
    v[:4] = [2**24 + 1, -(2**24 + 3), 2**31 - 1, -2**31]
    idx = rng.integers(0, 4096, 600).astype(np.int32)
    out = np.asarray(take_mxu(jnp.asarray(v), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, v[idx])


def test_take_mxu_clamps_out_of_range():
    v = jnp.arange(10.0)
    idx = jnp.asarray([-3, 0, 9, 15], jnp.int32)
    out = np.asarray(take_mxu(v, idx))
    np.testing.assert_allclose(out, [0.0, 0.0, 9.0, 9.0])


def test_tile_moment_maps_window_local():
    """Window-local moments must equal reduce_window sums of the
    locally-re-coordinated products."""
    rng = np.random.default_rng(5)
    H, W, tile, stride = 96, 200, 16, 8
    w = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    d2x = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    d2y = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    S, Sx, Sy, Sxx, Syy, Sxy, D2x, D2y = OL.tile_moment_maps(
        w, d2x, d2y, tile, stride)

    # reference: per-window sums with window-local coordinates, dense
    Th = (H - tile) // stride + 1
    Tw = (W - tile) // stride + 1
    wn = np.asarray(w)
    ref_S = np.zeros((Th, Tw), np.float32)
    ref_Sx = np.zeros_like(ref_S)
    ref_Sxx = np.zeros_like(ref_S)
    ref_Sxy = np.zeros_like(ref_S)
    xs = np.arange(tile, dtype=np.float32)
    for i in range(Th):
        for j in range(Tw):
            blk = wn[i * stride:i * stride + tile,
                     j * stride:j * stride + tile]
            ref_S[i, j] = blk.sum()
            ref_Sx[i, j] = (blk * xs[None, :]).sum()
            ref_Sxx[i, j] = (blk * xs[None, :] ** 2).sum()
            ref_Sxy[i, j] = (blk * xs[:, None] * xs[None, :]).sum()
    np.testing.assert_allclose(np.asarray(S), ref_S, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Sx), ref_Sx, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Sxx), ref_Sxx, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(Sxy), ref_Sxy, rtol=1e-5, atol=1e-2)
    # D2 maps are plain (unweighted-coordinate) window sums
    ref_D2x = np.asarray(lax.reduce_window(d2x, 0.0, lax.add, (tile, tile),
                                           (stride, stride), "VALID"))
    np.testing.assert_allclose(np.asarray(D2x), ref_D2x, rtol=1e-5, atol=1e-4)


def test_merge_segments_joins_collinear_fragments():
    # three collinear fragments with gaps of 10 px, plus one distant line
    sp = jnp.asarray([[10., 10.], [60., 10.], [110., 10.], [10., 100.],
                      [0., 0.]])
    ep = jnp.asarray([[50., 10.], [100., 10.], [150., 10.], [80., 100.],
                      [0., 0.]])
    score = jnp.asarray([5., 4., 3., 6., 0.])
    valid = jnp.asarray([True, True, True, True, False])
    sp_m, ep_m, ang, sc, v = OL.merge_segments(sp, ep, score, valid,
                                               ang_th=0.1, dist_th=2.5,
                                               gap_th=14.0)
    v = np.asarray(v)
    assert v.sum() == 2, v
    roots = np.nonzero(v)[0]
    lens = np.linalg.norm(np.asarray(ep_m - sp_m)[roots], axis=1)
    assert np.isclose(max(lens), 140.0, atol=1.5), lens   # 10 -> 150
    assert np.isclose(min(lens), 70.0, atol=1.5), lens
    # merged support accumulates
    assert np.isclose(np.asarray(sc)[roots].max(), 12.0, atol=1e-3)


def test_merge_segments_respects_gap_gate():
    sp = jnp.asarray([[10., 10.], [90., 10.]])
    ep = jnp.asarray([[50., 10.], [130., 10.]])
    score = jnp.asarray([5., 4.])
    valid = jnp.asarray([True, True])
    _, _, _, _, v = OL.merge_segments(sp, ep, score, valid,
                                      ang_th=0.1, dist_th=2.5, gap_th=14.0)
    assert np.asarray(v).sum() == 2   # 40 px gap stays split
