"""Distributed LBA on the simulated CPU mesh: device-count invariance +
agreement with the single-device solver (SURVEY.md §7.2 'assert sharded
Schur solve equals single-device solve')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.backend import lba
from plslam_tpu.parallel.mesh import make_mesh
from plslam_tpu.parallel.dist_lba import make_dist_lba_step

from test_lba import make_lba_problem  # noqa: E402

CAM = StereoCamera.from_config(CameraConfig(
    width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
    baseline=0.4))


def _pad_problem(prob, k_mult=8, q_mult=8):
    """Pad observation-slot and landmark axes to device-count multiples."""
    W, K = prob.obs_pt_id.shape
    L = prob.obs_ln_sid.shape[1]
    P = prob.pt_pos.shape[0]
    Q = prob.ep_pos.shape[0]
    pad_k = (-K) % k_mult
    pad_l = (-L) % q_mult
    pad_p = (-P) % q_mult
    pad_q = (-Q) % q_mult
    return prob._replace(
        obs_pt_uv=jnp.pad(prob.obs_pt_uv, ((0, 0), (0, pad_k), (0, 0))),
        obs_pt_disp=jnp.pad(prob.obs_pt_disp, ((0, 0), (0, pad_k))),
        obs_pt_id=jnp.pad(prob.obs_pt_id, ((0, 0), (0, pad_k)),
                          constant_values=-1),
        obs_ln_le=jnp.pad(prob.obs_ln_le, ((0, 0), (0, pad_l), (0, 0))),
        obs_ln_sid=jnp.pad(prob.obs_ln_sid, ((0, 0), (0, pad_l)),
                           constant_values=-1),
        obs_ln_eid=jnp.pad(prob.obs_ln_eid, ((0, 0), (0, pad_l)),
                           constant_values=-1),
        pt_pos=jnp.pad(prob.pt_pos, ((0, pad_p), (0, 0))),
        ep_pos=jnp.pad(prob.ep_pos, ((0, pad_q), (0, 0))))


@pytest.fixture(scope="module")
def problem():
    prob, *_ = make_lba_problem(jax.random.PRNGKey(5), W=4, P=64, Q=16,
                                noise_px=0.3)
    return _pad_problem(prob)


def test_mesh_invariance(problem):
    """Same step on 1, 2, 4, 8 devices must agree."""
    lam = jnp.asarray(1e-4)
    outs = []
    for n in [1, 2, 4, 8]:
        mesh = make_mesh(n, axes=("lm",))
        step = make_dist_lba_step(mesh, CAM)
        outs.append(step(problem, lam))
    d0 = outs[0]
    for n, d in zip([2, 4, 8], outs[1:]):
        for a, b, name in zip(d0, d, ["dxi", "d_pt", "d_ep"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=4e-3,  # f32 cross-mesh
                # reduction-order noise on weakly-observed landmarks
                err_msg=f"{name} differs on {n}-device mesh")


def test_dist_matches_single_device_direction(problem):
    """Robust-scale estimators differ (MAD vs mean-|r|), so steps are not
    identical — but they must be strongly aligned and similar magnitude."""
    lam = jnp.asarray(1e-4)
    mesh = make_mesh(8, axes=("lm",))
    step = make_dist_lba_step(mesh, CAM)
    dxi_d, dpt_d, dep_d = step(problem, lam)
    dxi_s, dpt_s, dep_s = lba._assemble_and_solve(problem, CAM, lam)
    for a, b in [(dxi_d, dxi_s), (dpt_d, dpt_s)]:
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        cos = a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
        assert cos > 0.99, f"step direction mismatch: cos={cos:.4f}"
        ratio = np.linalg.norm(a) / max(np.linalg.norm(b), 1e-12)
        assert 0.7 < ratio < 1.4, f"step magnitude ratio {ratio:.3f}"


def test_dist_lba_converges(problem):
    """Iterating the sharded step must reduce the true LBA cost."""
    from plslam_tpu.core import lie
    mesh = make_mesh(4, axes=("lm",))
    step = make_dist_lba_step(mesh, CAM)
    prob = problem
    c0 = float(lba.lba_cost(prob, CAM))
    lam = jnp.asarray(1e-4)
    for _ in range(6):
        dxi, d_pt, d_ep = step(prob, lam)
        prob = prob._replace(
            kf_pose=jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dxi, prob.kf_pose),
            pt_pos=prob.pt_pos + d_pt,
            ep_pos=prob.ep_pos + d_ep)
    c1 = float(lba.lba_cost(prob, CAM))
    assert c1 < 0.2 * c0, (c0, c1)


def test_dp_windows_match_per_window_steps():
    """Data-parallel windows on the (kf, lm) mesh: two independent LBA
    windows batched over the 'kf' axis must produce the same steps as
    the lm-sharded step applied to each window alone."""
    from plslam_tpu.parallel.dist_lba import make_dist_lba_step_dp
    probs = []
    for seed in (5, 11):
        p, *_ = make_lba_problem(jax.random.PRNGKey(seed), W=4, P=64,
                                 Q=16, noise_px=0.3)
        probs.append(_pad_problem(p, k_mult=4, q_mult=4))
    batched = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *probs)

    lam = jnp.asarray(1e-4)
    mesh2d = make_mesh(8, axes=("kf", "lm"))       # (2, 4)
    assert mesh2d.shape["kf"] == 2 and mesh2d.shape["lm"] == 4
    dp = make_dist_lba_step_dp(mesh2d, CAM)
    dxi_b, dpt_b, dep_b = dp(batched, lam)

    mesh1d = make_mesh(4, axes=("lm",))
    single = make_dist_lba_step(mesh1d, CAM)
    for g, prob in enumerate(probs):
        dxi, d_pt, d_ep = single(prob, lam)
        np.testing.assert_allclose(np.asarray(dxi_b[g]), np.asarray(dxi),
                                   atol=4e-3)
        np.testing.assert_allclose(np.asarray(dpt_b[g]), np.asarray(d_pt),
                                   atol=4e-3)
        np.testing.assert_allclose(np.asarray(dep_b[g]), np.asarray(d_ep),
                                   atol=4e-3)
