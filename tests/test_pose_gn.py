"""Solver tests on synthetic geometry with known ground-truth pose.

Validates GN/LM numerical behavior (SURVEY.md §7.2 'robust GN numerical
parity') before any dataset-level run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import line_equation
from plslam_tpu.tracking import pose_gn

CFG = SlamConfig()
CAM = StereoCamera.from_config(CameraConfig(
    width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0, baseline=0.4))


def make_problem(key, n_pts=200, n_lns=40, noise=0.0, outlier_frac=0.0,
                 dt_scale=0.2):
    ks = jax.random.split(key, 8)
    P = jnp.stack([
        jax.random.uniform(ks[0], (n_pts,), minval=-6, maxval=6),
        jax.random.uniform(ks[1], (n_pts,), minval=-4, maxval=4),
        jax.random.uniform(ks[2], (n_pts,), minval=4, maxval=30)], axis=-1)
    xi = jax.random.normal(ks[3], (6,)) * jnp.asarray(
        [dt_scale, dt_scale, dt_scale, 0.02, 0.05, 0.02])
    T_gt = lie.exp_se3(xi)
    uv = CAM.project(lie.transform_points(T_gt, P))
    uv = uv + noise * jax.random.normal(ks[4], uv.shape)
    n_out = int(outlier_frac * n_pts)
    if n_out:
        uv = uv.at[:n_out].add(
            60.0 * jax.random.normal(ks[5], (n_out, 2)))
    pts = pose_gn.PointTerms(P, uv, jnp.ones((n_pts,), bool))

    sP = jnp.stack([
        jax.random.uniform(ks[6], (n_lns,), minval=-6, maxval=6),
        jax.random.uniform(ks[7], (n_lns,), minval=-4, maxval=4),
        jax.random.uniform(jax.random.fold_in(key, 9), (n_lns,), minval=4, maxval=25)],
        axis=-1)
    d = jax.random.normal(jax.random.fold_in(key, 10), (n_lns, 3))
    eP = sP + d / jnp.linalg.norm(d, axis=-1, keepdims=True) * 2.0
    sp_px = CAM.project(lie.transform_points(T_gt, sP))
    ep_px = CAM.project(lie.transform_points(T_gt, eP))
    le = line_equation(sp_px, ep_px)
    lns = pose_gn.LineTerms(sP, eP, le, jnp.ones((n_lns,), bool))
    return T_gt, pts, lns


def pose_err(T_est, T_gt):
    d = lie.log_se3(lie.inverse_se3(T_gt) @ T_est)
    return float(jnp.linalg.norm(d[:3])), float(jnp.linalg.norm(d[3:]))


def test_gn_converges_points_only():
    T_gt, pts, _ = make_problem(jax.random.PRNGKey(0))
    res = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, None, CFG)
    et, er = pose_err(res.T, T_gt)
    assert et < 1e-3 and er < 1e-4, (et, er)
    assert bool(res.good)
    assert int(res.n_inliers) > 150


def test_gn_converges_points_and_lines():
    T_gt, pts, lns = make_problem(jax.random.PRNGKey(1))
    res = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, lns, CFG)
    et, er = pose_err(res.T, T_gt)
    assert et < 1e-3 and er < 1e-4, (et, er)


def test_gn_lines_only():
    """Lines alone must constrain the pose (needs enough non-degenerate
    segments)."""
    T_gt, pts, lns = make_problem(jax.random.PRNGKey(2), n_lns=80)
    empty = pose_gn.PointTerms(jnp.zeros((0, 3)), jnp.zeros((0, 2)),
                               jnp.zeros((0,), bool))
    res = pose_gn.optimize_pose(jnp.eye(4), CAM, empty, lns, CFG)
    et, er = pose_err(res.T, T_gt)
    assert et < 5e-2 and er < 5e-3, (et, er)


def test_gn_robust_to_outliers():
    T_gt, pts, lns = make_problem(jax.random.PRNGKey(3), noise=0.3,
                                  outlier_frac=0.25)
    res = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, lns, CFG)
    et, er = pose_err(res.T, T_gt)
    assert et < 0.02 and er < 2e-3, (et, er)
    # outliers flagged
    inl = np.asarray(res.inlier_pt)
    assert inl[:50].mean() < 0.3          # injected outliers mostly cut
    assert inl[50:].mean() > 0.8


def test_covariance_scales_with_noise():
    covs = []
    for noise in [0.1, 1.0]:
        T_gt, pts, _ = make_problem(jax.random.PRNGKey(4), noise=noise)
        res = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, None, CFG)
        covs.append(float(jnp.trace(res.cov)))
    assert covs[1] > 10.0 * covs[0], covs


def test_degenerate_too_few_features_gated():
    T_gt, pts, _ = make_problem(jax.random.PRNGKey(5), n_pts=8)
    res = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, None, CFG)
    assert not bool(res.good)


def test_all_invalid_is_finite():
    pts = pose_gn.PointTerms(jnp.ones((16, 3)), jnp.ones((16, 2)),
                             jnp.zeros((16,), bool))
    res = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, None, CFG)
    assert np.all(np.isfinite(np.asarray(res.T)))
    assert not bool(res.good)


def test_lm_matches_gn_on_wellposed():
    T_gt, pts, lns = make_problem(jax.random.PRNGKey(6), noise=0.2)
    r1 = pose_gn.optimize_pose(jnp.eye(4), CAM, pts, lns, CFG)
    r2 = pose_gn.optimize_pose_lm(jnp.eye(4), CAM, pts, lns, CFG)
    et1, _ = pose_err(r1.T, T_gt)
    et2, _ = pose_err(r2.T, T_gt)
    assert abs(et1 - et2) < 5e-3


def test_jit_compiles_once():
    f = jax.jit(lambda T0, pts, lns: pose_gn.optimize_pose(
        T0, CAM, pts, lns, CFG).T)
    T_gt, pts, lns = make_problem(jax.random.PRNGKey(7))
    out1 = f(jnp.eye(4), pts, lns)
    T_gt2, pts2, lns2 = make_problem(jax.random.PRNGKey(8))
    out2 = f(jnp.eye(4), pts2, lns2)
    assert out1.shape == out2.shape == (4, 4)
