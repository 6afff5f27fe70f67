"""Distributed LBA on the simulated CPU mesh: device-count invariance,
agreement with the single-device solver (SURVEY.md §7.2 'assert sharded
Schur solve equals single-device solve'), and the sharded-map comm
contract (all-reduce volume independent of landmark count)."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.backend import lba
from plslam_tpu.parallel.mesh import make_mesh
from plslam_tpu.parallel.dist_lba import (bucket_problem_by_owner,
                                          comm_bytes_per_step,
                                          make_dist_lba_step,
                                          unbucket_landmarks)

from test_lba import make_lba_problem  # noqa: E402

CAM = StereoCamera.from_config(CameraConfig(
    width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
    baseline=0.4))


def _pad_problem(prob, k_mult=8, q_mult=16):
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


def test_bucketing_roundtrip(problem):
    """Owner bucketing is a pure relabeling: landmark positions permute,
    observations keep their geometry, no slot is dropped at these sizes,
    and the true LBA cost is unchanged."""
    b = bucket_problem_by_owner(problem, 4)
    assert int(b.n_dropped) == 0
    np.testing.assert_allclose(
        np.asarray(unbucket_landmarks(b.problem.pt_pos, b.pt_perm)),
        np.asarray(problem.pt_pos))
    np.testing.assert_allclose(
        np.asarray(unbucket_landmarks(b.problem.ep_pos, b.ep_perm)),
        np.asarray(problem.ep_pos))
    c0 = float(lba.lba_cost(problem, CAM))
    c1 = float(lba.lba_cost(b.problem, CAM))
    assert abs(c0 - c1) < 1e-2 * max(abs(c0), 1.0), (c0, c1)
    # every shard's column slice references only its own landmark range
    n, K = 4, problem.obs_pt_id.shape[1]
    ids = np.asarray(b.problem.obs_pt_id)
    P_loc = problem.pt_pos.shape[0] // n
    for d in range(n):
        sl = ids[:, d * (K // n):(d + 1) * (K // n)]
        live = sl[sl >= 0]
        if live.size:
            assert live.min() >= d * P_loc and live.max() < (d + 1) * P_loc


def test_mesh_invariance(problem):
    """Same step on 1, 2, 4, 8 devices must agree (in original order)."""
    lam = jnp.asarray(1e-4)
    outs = []
    for n in [1, 2, 4, 8]:
        mesh = make_mesh(n, axes=("lm",))
        step = make_dist_lba_step(mesh, CAM)
        b = bucket_problem_by_owner(problem, n)
        assert int(b.n_dropped) == 0
        dxi, d_pt, d_ep = step(b.problem, lam)
        outs.append((np.asarray(dxi),
                     np.asarray(unbucket_landmarks(d_pt, b.pt_perm)),
                     np.asarray(unbucket_landmarks(d_ep, b.ep_perm))))
    d0 = outs[0]
    for n, d in zip([2, 4, 8], outs[1:]):
        for a, b_, name in zip(d0, d, ["dxi", "d_pt", "d_ep"]):
            np.testing.assert_allclose(
                a, b_, atol=4e-3,  # f32 cross-mesh reduction-order noise
                err_msg=f"{name} differs on {n}-device mesh")


def test_dist_matches_single_device_direction(problem):
    """Robust-scale estimators differ (MAD vs mean-|r|), so steps are not
    identical — but they must be strongly aligned and similar magnitude."""
    lam = jnp.asarray(1e-4)
    mesh = make_mesh(8, axes=("lm",))
    step = make_dist_lba_step(mesh, CAM)
    b = bucket_problem_by_owner(problem, 8)
    dxi_d, dpt_d, _ = step(b.problem, lam)
    dpt_d = unbucket_landmarks(dpt_d, b.pt_perm)
    dxi_s, dpt_s, _ = lba._assemble_and_solve(problem, CAM, lam)
    for a, b_ in [(dxi_d, dxi_s), (dpt_d, dpt_s)]:
        a = np.asarray(a).ravel()
        b_ = np.asarray(b_).ravel()
        cos = a @ b_ / max(np.linalg.norm(a) * np.linalg.norm(b_), 1e-12)
        assert cos > 0.99, f"step direction mismatch: cos={cos:.4f}"
        ratio = np.linalg.norm(a) / max(np.linalg.norm(b_), 1e-12)
        assert 0.7 < ratio < 1.4, f"step magnitude ratio {ratio:.3f}"


def test_dist_lba_converges(problem):
    """Iterating the sharded step must reduce the true LBA cost (the
    state stays in the sharded layout throughout, as deployed)."""
    from plslam_tpu.core import lie
    mesh = make_mesh(4, axes=("lm",))
    step = make_dist_lba_step(mesh, CAM)
    prob = bucket_problem_by_owner(problem, 4).problem
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


def _all_reduce_bytes(compiled_text: str) -> int:
    """Sum the output bytes of every all-reduce in an HLO dump."""
    total = 0
    for line in compiled_text.splitlines():
        if " all-reduce(" not in line and " all-reduce-start(" not in line:
            continue
        lhs = line.split(" all-reduce")[0]
        for m in re.finditer(r"(f32|s32|u32)\[([\d,]*)\]", lhs):
            dims = [int(d) for d in m.group(2).split(",") if d]
            n = 1
            for d in dims:
                n *= d
            total += 4 * n
    return total


def test_comm_volume_independent_of_landmark_count():
    """THE sharded-map contract: per-step all-reduce volume must not
    grow with the landmark count (the round-1 design psummed dense
    O(W*P) blocks). Verified on the compiled HLO."""
    mesh = make_mesh(4, axes=("lm",))
    step = make_dist_lba_step(mesh, CAM)
    lam = jnp.asarray(1e-4)
    vols = []
    for Psz in (64, 256):
        prob, *_ = make_lba_problem(jax.random.PRNGKey(7), W=4, P=Psz,
                                    Q=16, noise_px=0.3)
        b = bucket_problem_by_owner(_pad_problem(prob), 4)
        txt = step.lower(b.problem, lam).compile().as_text()
        vols.append(_all_reduce_bytes(txt))
    assert vols[0] == vols[1], vols            # independent of P
    assert 0 < vols[0] <= 4 * comm_bytes_per_step(W=4), vols


def test_dp_windows_match_per_window_steps():
    """Data-parallel windows on the (kf, lm) mesh: two independent LBA
    windows batched over the 'kf' axis must produce the same steps as
    the lm-sharded step applied to each window alone."""
    from plslam_tpu.parallel.dist_lba import make_dist_lba_step_dp
    probs = []
    for seed in (5, 11):
        p, *_ = make_lba_problem(jax.random.PRNGKey(seed), W=4, P=64,
                                 Q=16, noise_px=0.3)
        probs.append(bucket_problem_by_owner(
            _pad_problem(p, k_mult=4, q_mult=8), 4).problem)
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


def test_live_slam_with_distributed_lba():
    """End-to-end SLAM with mapping.distributed=true on the 8-CPU-device
    mesh: the live system routes every window LBA through the owner-
    sharded multi-device LM solve and must produce the single-device
    trajectory (within f32 reduction noise + the distributed robust
    scale's mean-|r| vs MAD difference)."""
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend.slam_system import PLSLAM
    from plslam_tpu.utils.evaluation import ate_rmse

    base = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 256, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 32, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5,
                    "lba_max_points": 1024, "lba_max_lines": 64},
        "keyframe": {"min_entropy_ratio": 0.97},
        "loop": {"enabled": False},
        "system": {"async_mapping": False},
    })
    cam = StereoCamera.from_config(base.camera)
    n = 25
    seq = synthetic.make_sequence(cam, n_frames=n, seed=5,
                                  n_points=500, n_lines=0, noise=0.004,
                                  step=0.25)

    def run(cfg):
        slam = PLSLAM(cfg, cam)
        slam.initialize(seq.images_l[0], seq.images_r[0])
        for i in range(1, n):
            slam.process(seq.images_l[i], seq.images_r[i])
        est = slam.finish()
        return est, slam._kf_slot + 1

    est_1, kfs_1 = run(base)
    est_d, kfs_d = run(base.with_updates(
        {"mapping": {"distributed": True, "dist_devices": 8}}))
    est_d1, kfs_d1 = run(base.with_updates(
        {"mapping": {"distributed": True, "dist_devices": 1}}))
    assert kfs_d == kfs_1 == kfs_d1, (kfs_d, kfs_1, kfs_d1)
    # contract 1 — device-count invariance: the 8-device mesh must
    # reproduce the 1-device mesh trajectory to f32 reduction noise
    d = max(np.linalg.norm(e1[:3, 3] - e2[:3, 3])
            for e1, e2 in zip(est_d, est_d1))
    assert d < 1e-3, d
    # contract 2 — accuracy parity with the dense solver (the solvers
    # differ only in the robust scale estimator: distributed mean-|r|
    # vs dense MAD, so equality is in the ATE band, not pointwise)
    a1 = float(ate_rmse(est_1, seq.poses[:len(est_1)]))
    ad = float(ate_rmse(est_d, seq.poses[:len(est_d)]))
    assert ad < max(1.5 * a1, a1 + 0.01), (a1, ad)
