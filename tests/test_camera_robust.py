"""Tests for the stereo camera model and robust statistics."""

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import CameraConfig
from plslam_tpu.core.camera import StereoCamera, remap_bilinear, build_rectify_map
from plslam_tpu.core import robust


def make_cam():
    return StereoCamera.from_config(CameraConfig())


def test_project_backproject_roundtrip():
    cam = make_cam()
    key = jax.random.PRNGKey(0)
    P = jnp.stack([
        jax.random.uniform(key, (100,), minval=-5, maxval=5),
        jax.random.uniform(jax.random.fold_in(key, 1), (100,), minval=-3, maxval=3),
        jax.random.uniform(jax.random.fold_in(key, 2), (100,), minval=2, maxval=40),
    ], axis=-1)
    uv, disp = cam.project_stereo(P)
    P2 = cam.back_project(uv, disp)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), rtol=1e-4, atol=1e-4)


def test_project_jacobian_matches_autodiff():
    cam = make_cam()
    P = jnp.array([[1.0, -0.5, 8.0], [-2.0, 1.0, 3.0]])
    J = cam.project_jacobian(P)
    Jad = jax.vmap(jax.jacobian(cam.project))(P)
    np.testing.assert_allclose(np.asarray(J), np.asarray(Jad), atol=1e-4)


def test_remap_identity():
    img = jax.random.uniform(jax.random.PRNGKey(1), (32, 40))
    vs, us = np.mgrid[0:32, 0:40].astype(np.float32)
    mapping = jnp.asarray(np.stack([us, vs], axis=-1))
    out = remap_bilinear(img, mapping)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_remap_shift():
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    vs, us = np.mgrid[0:10, 0:10].astype(np.float32)
    mapping = jnp.asarray(np.stack([us + 0.5, vs], axis=-1))
    out = np.asarray(remap_bilinear(img, mapping))
    # interior pixels are the average of horizontal neighbors
    expect = 0.5 * (np.arange(100).reshape(10, 10)[:, :-1]
                    + np.arange(100).reshape(10, 10)[:, 1:])
    np.testing.assert_allclose(out[:, :-1], expect, atol=1e-5)


def test_rectify_map_no_distortion_identity():
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    m = build_rectify_map(K, K, (0, 0, 0, 0, 0), np.eye(3), 480, 640)
    vs, us = np.mgrid[0:480, 0:640].astype(np.float32)
    np.testing.assert_allclose(m[..., 0], us, atol=1e-3)
    np.testing.assert_allclose(m[..., 1], vs, atol=1e-3)


def test_masked_median():
    x = jnp.asarray([5.0, 1.0, 9.0, 3.0, 7.0, 100.0])
    mask = jnp.asarray([True, True, True, True, True, False])
    assert float(robust.masked_median(x, mask)) == 5.0
    # even count -> lower middle
    mask2 = jnp.asarray([True, True, True, True, False, False])
    assert float(robust.masked_median(x, mask2)) == 3.0
    # all invalid -> 0
    assert float(robust.masked_median(x, jnp.zeros(6, bool))) == 0.0


def test_mad_scale_estimates_sigma():
    r = jax.random.normal(jax.random.PRNGKey(2), (4096,)) * 2.5
    mask = jnp.ones((4096,), bool)
    sigma = float(robust.mad_scale(r, mask))
    assert abs(sigma - 2.5) < 0.25


def test_mad_scale_ignores_outliers():
    r = jnp.concatenate([
        jax.random.normal(jax.random.PRNGKey(3), (1000,)),
        jnp.full((50,), 1000.0)])
    sigma = float(robust.mad_scale(r, jnp.ones_like(r, dtype=bool)))
    assert sigma < 2.0


def test_weights_shapes_and_range():
    r = jnp.linspace(-10, 10, 21)
    s = jnp.asarray(1.0)
    for w in [robust.tstudent_weight(r, s), robust.cauchy_weight(r, s),
              robust.huber_weight(r, jnp.asarray(1.345))]:
        w = np.asarray(w)
        assert w.shape == (21,)
        assert np.all((w > 0) & (w <= 1.0 + 1.3))  # tstudent max = (dof+1)/dof
        # monotone non-increasing in |r|
        assert np.all(np.diff(w[10:]) <= 1e-6)


def test_stereo_rectify_row_aligns_and_preserves_disparity():
    """Full-rig rectification property test: after applying (R1, R2, K_new)
    from stereo_rectify to a rotated, distorted rig, corresponding pixels
    of random 3D points share rows and have disparity fx_new * b / z'."""
    from plslam_tpu.core.camera import stereo_rectify, build_rectify_map
    rng = np.random.default_rng(7)
    W, H = 640, 480
    K0 = np.array([[460.0, 0, 360.0], [0, 455.0, 240.0], [0, 0, 1]])
    K1 = np.array([[458.0, 0, 370.0], [0, 457.0, 235.0], [0, 0, 1]])
    d0 = (-0.28, 0.07, 1e-4, 2e-5, 0.0)
    d1 = (-0.28, 0.07, 1e-4, 2e-5, 0.0)
    # small relative rotation + mostly-x baseline (EuRoC-like), exact f64
    w = np.array([0.02, -0.015, 0.01])
    th = np.linalg.norm(w)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    t = np.array([-0.11, 0.0004, -0.0007])
    map_l, map_r, cam_cfg = stereo_rectify(K0, d0, K1, d1, R, t, H, W)
    assert map_l.shape == (H, W, 2) and map_r.shape == (H, W, 2)
    b = cam_cfg.baseline
    np.testing.assert_allclose(b, np.linalg.norm(t), rtol=1e-12)

    # recompute R1/R2 the way stereo_rectify does, via its own outputs:
    # invert the map relation at the principal point is messy — instead
    # verify the geometric contract directly through projection of points.
    from plslam_tpu.core.camera import _rot_sqrt
    Rh = _rot_sqrt(R)
    t_mid = Rh.T @ t
    e1 = -t_mid / np.linalg.norm(t_mid)
    e2 = np.cross([0.0, 0.0, 1.0], e1); e2 /= np.linalg.norm(e2)
    e3 = np.cross(e1, e2)
    Rw = np.stack([e1, e2, e3])
    R1, R2 = Rw @ Rh, Rw @ Rh.T
    # rotations must be orthonormal and consistent: R2 R = R1
    np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(R2 @ R, R1, atol=1e-12)

    X = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200),
                  rng.uniform(2.0, 20.0, 200)], axis=-1)
    xl = (R1 @ X.T).T                       # rectified-left coords
    xr = (R2 @ (R @ X.T + t[:, None])).T    # rectified-right coords
    # same row, x-offset by exactly the baseline
    np.testing.assert_allclose(xr[:, 1:], xl[:, 1:], atol=1e-10)
    np.testing.assert_allclose(xl[:, 0] - xr[:, 0], b, atol=1e-10)
    f = cam_cfg.fx
    ul = f * xl[:, 0] / xl[:, 2] + cam_cfg.cx
    ur = f * xr[:, 0] / xr[:, 2] + cam_cfg.cx
    vl = f * xl[:, 1] / xl[:, 2] + cam_cfg.cy
    vr = f * xr[:, 1] / xr[:, 2] + cam_cfg.cy
    np.testing.assert_allclose(vl, vr, atol=1e-8)          # row-aligned
    np.testing.assert_allclose(ul - ur, f * b / xl[:, 2], atol=1e-8)


def test_rectify_map_identity_rig():
    """Zero distortion + already-aligned rig: the map must be (near)
    identity up to the principal-point shift, and remap must reproduce
    the input image."""
    from plslam_tpu.core.camera import (stereo_rectify, StereoRectifier)
    W, H = 64, 48
    K = np.array([[100.0, 0, W / 2.0], [0, 100.0, H / 2.0], [0, 0, 1]])
    d = (0.0, 0.0, 0.0, 0.0, 0.0)
    map_l, map_r, cam_cfg = stereo_rectify(
        K, d, K, d, np.eye(3), np.array([-0.2, 0.0, 0.0]), H, W)
    vs, us = np.mgrid[0:H, 0:W].astype(np.float32)
    np.testing.assert_allclose(map_l[..., 0], us, atol=1e-6)
    np.testing.assert_allclose(map_l[..., 1], vs, atol=1e-6)
    np.testing.assert_allclose(map_r[..., 0], us, atol=1e-6)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (H, W)).astype(np.float32)
    rect = StereoRectifier(map_l, map_r)
    out_l, out_r = rect(img, img)
    np.testing.assert_allclose(np.asarray(out_l), img, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_r), img, atol=1e-5)
