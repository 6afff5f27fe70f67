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
