"""Loop-closure tests: vocabulary, retrieval, pose graph, end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.loop import vocabulary
from plslam_tpu.loop.pose_graph import PoseGraph, optimize_pose_graph


def rand_desc(rng, n):
    return rng.integers(0, 2, (n, 256)).astype(np.uint8)


def test_vocabulary_build_and_transform():
    rng = np.random.default_rng(0)
    # 8 well-separated clusters with small perturbations
    centers = rand_desc(rng, 8)
    descs = []
    for c in centers:
        for _ in range(40):
            d = c.copy()
            flip = rng.choice(256, size=8, replace=False)
            d[flip] ^= 1
            descs.append(d)
    descs = np.stack(descs)
    voc = vocabulary.build_vocabulary(descs, k=4, levels=3, seed=0)
    leaves = np.asarray(vocabulary.transform_leaves(voc, jnp.asarray(descs)))
    # same-cluster descriptors should mostly share leaves
    agree = 0
    for i in range(8):
        grp = leaves[i * 40:(i + 1) * 40]
        agree += (grp == np.bincount(grp).argmax()).mean()
    assert agree / 8 > 0.8, agree / 8


def test_bow_similarity_orders_scenes():
    rng = np.random.default_rng(1)
    base = rand_desc(rng, 300)
    voc = vocabulary.build_vocabulary(base, k=8, levels=3, seed=0)
    a = base[:150]
    # near-duplicate of a (few bit flips)
    a2 = a.copy()
    for d in a2:
        d[rng.choice(256, 5, replace=False)] ^= 1
    b = rand_desc(rng, 150)
    va = vocabulary.bow_vector(voc, jnp.asarray(a))
    va2 = vocabulary.bow_vector(voc, jnp.asarray(a2))
    vb = vocabulary.bow_vector(voc, jnp.asarray(b))
    s_same = float(vocabulary.l1_score(va, va2))
    s_diff = float(vocabulary.l1_score(va, vb))
    assert s_same > s_diff + 0.2, (s_same, s_diff)


def test_vocab_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    voc = vocabulary.build_vocabulary(rand_desc(rng, 200), k=4, levels=2)
    p = str(tmp_path / "voc.npz")
    vocabulary.save_vocabulary(voc, p)
    voc2 = vocabulary.load_vocabulary(p)
    d = jnp.asarray(rand_desc(rng, 50))
    np.testing.assert_array_equal(
        np.asarray(vocabulary.transform_leaves(voc, d)),
        np.asarray(vocabulary.transform_leaves(voc2, d)))


def test_pose_graph_closes_drift():
    """Square loop with odometry drift: the loop edge must pull the chain
    closed, distributing the error (g2o essential-graph parity)."""
    F, E = 16, 64
    n = 12
    # ground truth: circle of 12 poses
    gt = []
    T = np.eye(4, dtype=np.float32)
    step = np.asarray(lie.exp_se3(jnp.asarray(
        [0.5, 0, 0, 0, 2 * np.pi / n, 0], dtype=jnp.float32)))
    for _ in range(n):
        gt.append(T.copy())
        T = T @ step
    gt = np.stack(gt)
    # drifted odometry: inject error in every relative step
    rng = np.random.default_rng(3)
    poses = [gt[0]]
    rels = []
    for i in range(1, n):
        T_rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = np.asarray(lie.exp_se3(jnp.asarray(
            np.concatenate([rng.normal(0, 0.01, 3), rng.normal(0, 0.004, 3)]),
            dtype=jnp.float32)))
        T_rel_noisy = T_rel @ noise
        rels.append(T_rel_noisy)
        poses.append(poses[-1] @ T_rel_noisy)
    poses = np.stack(poses).astype(np.float32)
    drift = np.linalg.norm((np.linalg.inv(poses[-1]) @ gt[-1])[:3, 3])

    pose_arr = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    pose_arr[:n] = poses
    valid = np.zeros((F,), bool)
    valid[:n] = True
    ei = np.zeros((E,), np.int32)
    ej = np.zeros((E,), np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ew = np.zeros((E,), np.float32)
    for i in range(n - 1):
        ei[i], ej[i], eT[i], ew[i] = i, i + 1, rels[i], 1.0
    # loop edge: exact measurement from last back to first
    T_loop = np.linalg.inv(gt[n - 1]) @ gt[0]
    ei[n - 1], ej[n - 1], eT[n - 1], ew[n - 1] = n - 1, 0, T_loop, 2.0

    g = PoseGraph(jnp.asarray(pose_arr), jnp.asarray(valid),
                  jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eT),
                  jnp.asarray(ew))
    new_poses, c0, c1 = optimize_pose_graph(g, iters=20)
    assert float(c1) < float(c0) * 0.1, (float(c0), float(c1))
    # loop closes: residual of the loop edge becomes small
    npo = np.asarray(new_poses)
    loop_err = np.linalg.norm(
        (np.linalg.inv(T_loop) @ np.linalg.inv(npo[n - 1]) @ npo[0])[:3, 3])
    assert loop_err < 0.05, loop_err
    # first pose pinned
    np.testing.assert_allclose(npo[0], poses[0], atol=1e-4)


def test_covisibility_counts():
    """Shared-landmark counting against a hand-built observation table."""
    from plslam_tpu.loop.loop_closer import covisibility_counts
    F, K, P = 6, 8, 32
    obs = np.full((F, K), -1, np.int32)
    obs[0, :4] = [1, 2, 3, 4]
    obs[1, :4] = [3, 4, 5, 6]        # shares {3,4} with KF0
    obs[2, :2] = [1, 9]              # shares {1} with KF0
    obs[3, :3] = [20, 21, 22]        # disjoint
    counts = np.asarray(covisibility_counts(jnp.asarray(obs),
                                            jnp.asarray(0), P))
    np.testing.assert_array_equal(counts[:4], [4, 2, 1, 0])
    # duplicate landmark ids in a row must not double-count membership
    obs[4, :4] = [3, 3, 3, 7]
    counts = np.asarray(covisibility_counts(jnp.asarray(obs),
                                            jnp.asarray(4), P))
    assert counts[0] == 1 and counts[1] == 1, counts


@pytest.mark.slow
def test_slam_closes_synthetic_loop():
    """Full-stack loop closure on a circular trajectory (BASELINE config 4
    analogue). The camera completes a circle; revisiting the start must
    fire retrieval + verification and reduce final drift."""
    CFG = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},   # KF every frame
        "system": {"async_mapping": False},
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0},
    })
    cam = StereoCamera.from_config(CFG.camera)
    n = 40
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    from plslam_tpu.backend.slam_system import PLSLAM
    slam = PLSLAM(CFG, cam)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, n):
        slam.process(seq.images_l[i], seq.images_r[i])
    est = slam.finish()
    assert slam.loop_closer is not None
    assert slam.loop_closer.n_loops_closed >= 1, "no loop closed"
    from plslam_tpu.utils.evaluation import ate_rmse
    a = ate_rmse(est, seq.poses)
    assert a < 0.25, f"post-loop ATE {a:.3f} m"


def test_lc_unc_gate_rejects_degenerate_geometry():
    """isLoopClosure uncertainty gate (slamConfig lc_unc): a candidate
    pair whose verification solve is inlier-rich but geometrically
    degenerate (all matches on one small distant patch -> translation
    poorly constrained) must yield a covariance above the gate, while a
    well-conditioned pair stays far below it."""
    from plslam_tpu.loop.loop_closer import verify_loop_geometry

    cfg = SlamConfig().with_updates({
        "lines": {"has_lines": False},
        "tracking": {"min_features": 8}})
    cam = StereoCamera.from_config(cfg.camera)
    rng = np.random.default_rng(5)
    K = cfg.points.max_kpts

    def make_pair(P):
        """Stored-KF arrays for n 3D points seen from identity and a
        slightly moved pose (identical descriptors = perfect matches)."""
        n = P.shape[0]
        proj = lambda Q: np.stack(
            [np.asarray(cam.fx) * Q[:, 0] / Q[:, 2] + np.asarray(cam.cx),
             np.asarray(cam.fy) * Q[:, 1] / Q[:, 2] + np.asarray(cam.cy)],
            -1).astype(np.float32)
        T_ab = np.asarray(lie.exp_se3(jnp.asarray(
            [0.05, -0.02, 0.08, 0.004, 0.01, -0.006])), np.float32)
        P_b = P @ T_ab[:3, :3].T + T_ab[:3, 3]
        uv_a = np.zeros((K, 2), np.float32)
        uv_b = np.zeros((K, 2), np.float32)
        disp_a = np.zeros((K,), np.float32)
        uv_a[:n] = proj(P)
        uv_b[:n] = proj(P_b)
        disp_a[:n] = np.asarray(cam.fx * cam.b) / P[:, 2]
        desc = np.zeros((K, 256), np.uint8)
        desc[:n] = rng.integers(0, 2, (n, 256))
        from plslam_tpu.ops import hamming
        packed = np.asarray(hamming.pack_bits(jnp.asarray(desc)))
        zeros_l = jnp.zeros((cfg.lines.max_lines, 8), jnp.uint32)
        zeros_e = jnp.zeros((cfg.lines.max_lines, 6), jnp.float32)
        zeros_le = jnp.zeros((cfg.lines.max_lines, 3), jnp.float32)
        res, _ = verify_loop_geometry(
            jnp.asarray(packed), jnp.asarray(uv_a), jnp.asarray(disp_a),
            jnp.asarray(packed), jnp.asarray(uv_b),
            zeros_l, zeros_e, zeros_l, zeros_e, zeros_le, cam, cfg)
        from plslam_tpu.loop.loop_closer import floored_uncertainty
        return (bool(res.good), int(res.n_inliers),
                floored_uncertainty(res.cov, int(res.n_inliers),
                                    float(res.err), cfg))

    n = 60
    # well-conditioned: points spread across the frustum, 6-18 m
    P_good = np.stack([rng.uniform(-6, 6, n), rng.uniform(-2, 2, n),
                       rng.uniform(6, 18, n)], -1).astype(np.float32)
    # degenerate: a tight distant patch (~0.3 m wide at 180 m)
    P_bad = np.stack([150.0 + rng.uniform(-0.15, 0.15, n),
                      rng.uniform(-0.15, 0.15, n),
                      180.0 + rng.uniform(-0.5, 0.5, n)], -1
                     ).astype(np.float32)

    good_ok, good_inl, good_unc = make_pair(P_good)
    bad_ok, bad_inl, bad_unc = make_pair(P_bad)
    assert good_ok and good_inl >= 50
    assert good_unc < SlamConfig().loop.lc_unc, good_unc
    # the degenerate pair is inlier-rich yet must FAIL the lc_unc gate
    assert bad_inl >= 50
    assert bad_unc > SlamConfig().loop.lc_unc, bad_unc


def test_lc_unc_gate_active_in_live_path():
    """With an impossible lc_unc the live system must close ZERO loops
    on the scene where the default config closes at least one."""
    CFG = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},
        "system": {"async_mapping": False},
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0,
                 "lc_unc": 0.0},                      # impossible gate
    })
    cam = StereoCamera.from_config(CFG.camera)
    n = 40
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    from plslam_tpu.backend.slam_system import PLSLAM
    slam = PLSLAM(CFG, cam)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, n):
        slam.process(seq.images_l[i], seq.images_r[i])
    slam.finish()
    assert slam.loop_closer.n_loops_closed == 0
