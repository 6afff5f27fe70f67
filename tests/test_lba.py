"""Local BA tests: convergence to ground truth + Schur == dense solve
(SURVEY.md §7.2 'assert sharded/Schur solve equals dense solve')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import line_equation
from plslam_tpu.backend import lba

CFG = SlamConfig().with_updates({"mapping": {"lba_iters": 15}})
CAM = StereoCamera.from_config(CameraConfig(
    width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
    baseline=0.4))


def make_lba_problem(key, W=5, P=120, Q=40, noise_px=0.3, pose_noise=0.03,
                     pt_noise=0.05):
    """World: points in front of a forward-moving camera; every KF
    observes every landmark (dense visibility keeps the test simple)."""
    ks = jax.random.split(key, 10)
    pts_gt = jnp.stack([
        jax.random.uniform(ks[0], (P,), minval=-6, maxval=6),
        jax.random.uniform(ks[1], (P,), minval=-4, maxval=4),
        jax.random.uniform(ks[2], (P,), minval=6, maxval=25)], axis=-1)
    eps_gt = jnp.stack([
        jax.random.uniform(ks[3], (Q,), minval=-6, maxval=6),
        jax.random.uniform(ks[4], (Q,), minval=-4, maxval=4),
        jax.random.uniform(ks[5], (Q,), minval=6, maxval=25)], axis=-1)

    poses_gt = []  # T_cw per KF
    for w in range(W):
        xi = jnp.asarray([0.05 * w, 0.01 * w, -0.3 * w, 0.0, 0.015 * w, 0.0])
        poses_gt.append(lie.exp_se3(xi))
    poses_gt = jnp.stack(poses_gt)

    # observations
    def proj(Tcw, X):
        return CAM.project(lie.transform_points(Tcw, X))
    obs_uv = jax.vmap(lambda T: proj(T, pts_gt))(poses_gt)
    obs_uv = obs_uv + noise_px * jax.random.normal(ks[6], obs_uv.shape)
    obs_id = jnp.broadcast_to(jnp.arange(P), (W, P)).astype(jnp.int32)
    z = jax.vmap(lambda T: lie.transform_points(T, pts_gt)[..., 2])(poses_gt)
    obs_disp = CAM.fx * CAM.b / jnp.maximum(z, 1e-6)
    obs_disp = obs_disp + noise_px * jax.random.normal(
        jax.random.fold_in(key, 30), obs_disp.shape)

    # line observations: pair endpoints (q, q+1) for q even
    L = Q // 2
    sid = jnp.broadcast_to(jnp.arange(0, Q, 2), (W, L)).astype(jnp.int32)
    eid = sid + 1
    sp_px = jax.vmap(lambda T: proj(T, eps_gt[0::2]))(poses_gt)
    ep_px = jax.vmap(lambda T: proj(T, eps_gt[1::2]))(poses_gt)
    le = line_equation(sp_px + noise_px * jax.random.normal(ks[7], sp_px.shape),
                       ep_px + noise_px * jax.random.normal(ks[8], ep_px.shape))

    # perturb initial state (first KF fixed = gauge)
    dpose = jax.random.normal(ks[9], (W, 6)) * pose_noise
    dpose = dpose.at[0].set(0.0)
    kf_pose0 = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dpose, poses_gt)
    pt0 = pts_gt + pt_noise * jax.random.normal(jax.random.fold_in(key, 20),
                                                pts_gt.shape)
    ep0 = eps_gt + pt_noise * jax.random.normal(jax.random.fold_in(key, 21),
                                                eps_gt.shape)

    fixed = jnp.zeros((W,), bool).at[0].set(True)
    prob = lba.LBAProblem(
        kf_pose=kf_pose0, kf_fixed=fixed, kf_valid=jnp.ones((W,), bool),
        pt_pos=pt0, ep_pos=ep0, obs_pt_uv=obs_uv, obs_pt_disp=obs_disp,
        obs_pt_id=obs_id, obs_ln_le=le, obs_ln_sid=sid, obs_ln_eid=eid)
    return prob, poses_gt, pts_gt, eps_gt


def pose_errs(est, gt):
    d = jax.vmap(lambda a, b: lie.log_se3(lie.inverse_se3(b) @ a))(est, gt)
    return float(jnp.max(jnp.linalg.norm(d[:, :3], axis=-1)))


def test_lba_converges():
    # landmark init noise (0.4 m) well above the measurement-limited
    # posterior (~0.1 m at these depths/noise), so BA must improve both
    prob, poses_gt, pts_gt, eps_gt = make_lba_problem(
        jax.random.PRNGKey(0), pt_noise=0.4)
    res = lba.run_lba(prob, CAM, CFG)
    assert float(res.cost1) < float(res.cost0) * 0.2, (res.cost0, res.cost1)
    e0 = pose_errs(prob.kf_pose, poses_gt)
    e1 = pose_errs(res.kf_pose, poses_gt)
    assert e1 < e0 * 0.2, (e0, e1)
    d0 = float(jnp.sqrt(jnp.mean((prob.pt_pos - pts_gt) ** 2)))
    d1 = float(jnp.sqrt(jnp.mean((res.pt_pos - pts_gt) ** 2)))
    assert d1 < d0 * 0.6, (d0, d1)


def test_lba_noise_free_exact():
    prob, poses_gt, pts_gt, eps_gt = make_lba_problem(
        jax.random.PRNGKey(1), noise_px=0.0)
    res = lba.run_lba(prob, CAM, CFG)
    assert pose_errs(res.kf_pose, poses_gt) < 2e-3
    assert float(jnp.max(jnp.abs(res.pt_pos - pts_gt))) < 2e-2


def test_lba_gauge_fixed_kf_unmoved():
    prob, *_ = make_lba_problem(jax.random.PRNGKey(2))
    res = lba.run_lba(prob, CAM, CFG)
    np.testing.assert_allclose(np.asarray(res.kf_pose[0]),
                               np.asarray(prob.kf_pose[0]), atol=1e-6)


def test_schur_equals_dense():
    """The Schur-reduced step must equal the full dense normal-equation
    step on a small point-only problem (lambda=0, single iteration)."""
    prob, *_ = make_lba_problem(jax.random.PRNGKey(3), W=3, P=25, Q=2,
                                noise_px=0.1)
    # drop line observations for clarity
    prob = prob._replace(obs_ln_sid=jnp.full_like(prob.obs_ln_sid, -1),
                         obs_ln_eid=jnp.full_like(prob.obs_ln_eid, -1))
    lam = 1e-4
    dxi, d_pt, _ = lba._assemble_and_solve(prob, CAM, lam)

    # dense reference via autodiff-free explicit assembly
    W, P = 3, 25
    r, Jc, Jp, ok = lba._point_rj(prob.kf_pose, prob.pt_pos,
                                  prob.obs_pt_uv, prob.obs_pt_disp,
                                  prob.obs_pt_id, CAM)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    from plslam_tpu.core import robust as rb
    sigma = rb.mad_scale_zero_centered(rn.reshape(-1), ok.reshape(-1))
    wgt = jnp.where(ok, rb.tstudent_weight(rn, sigma), 0.0)
    free = ~prob.kf_fixed
    Jc = jnp.where(free[:, None, None, None], Jc, 0.0)

    n = 6 * W + 3 * P
    H = np.zeros((n, n))
    g = np.zeros(n)
    Jc_n, Jp_n, r_n, w_n = map(np.asarray, (Jc, Jp, r, wgt))
    ids = np.asarray(prob.obs_pt_id)
    for w_i in range(W):
        for k in range(P):
            if not bool(ok[w_i, k]):
                continue
            p = ids[w_i, k]
            Jrow = np.zeros((3, n))
            Jrow[:, 6 * w_i:6 * w_i + 6] = Jc_n[w_i, k]
            Jrow[:, 6 * W + 3 * p:6 * W + 3 * p + 3] = Jp_n[w_i, k]
            H += w_n[w_i, k] * Jrow.T @ Jrow
            g += w_n[w_i, k] * Jrow.T @ r_n[w_i, k]
    # same damping scheme as the Schur path
    diagH = np.maximum(np.diag(H).copy(), 1e-3)
    # pose-block damping is applied to S's diagonal there; replicate via
    # damping the full H diagonal (equivalent for the landmark block; for
    # the pose block S-diag == H-diag + schur correction, so tolerate small
    # differences by using loose atol below and tiny lambda)
    H += np.diag(lam * diagH)
    H[0:6, 0:6] += 1e8 * np.eye(6)  # pin fixed KF 0
    H += 1e-6 * np.eye(n)
    delta = -np.linalg.solve(H, g)
    dxi_dense = delta[:6 * W].reshape(W, 6)
    dpt_dense = delta[6 * W:].reshape(P, 3)

    # f32 einsum/scatter vs f64 loop: tolerate float noise, not structure
    np.testing.assert_allclose(np.asarray(dxi), dxi_dense, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_pt), dpt_dense,
                               rtol=2e-2, atol=5e-3)


def test_lba_no_observations_is_stable():
    prob, *_ = make_lba_problem(jax.random.PRNGKey(4), W=3, P=10, Q=2)
    prob = prob._replace(
        obs_pt_id=jnp.full_like(prob.obs_pt_id, -1),
        obs_ln_sid=jnp.full_like(prob.obs_ln_sid, -1),
        obs_ln_eid=jnp.full_like(prob.obs_ln_eid, -1))
    res = lba.run_lba(prob, CAM, CFG)
    assert np.all(np.isfinite(np.asarray(res.kf_pose)))
    np.testing.assert_allclose(np.asarray(res.pt_pos),
                               np.asarray(prob.pt_pos), atol=1e-6)
