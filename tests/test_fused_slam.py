"""Fully-fused SLAM driver (backend.fused_slam.FusedPLSLAM): one device
program per chunk with the KF criterion in-program must reproduce the
host-decision chunked driver, and still close loops end to end."""

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.backend.fused_slam import FusedPLSLAM
from plslam_tpu.backend.slam_system import ChunkedPLSLAM
from plslam_tpu.utils.evaluation import ate_rmse


def test_fused_matches_chunked_driver():
    """Same scene through FusedPLSLAM (in-program KF decisions) and
    ChunkedPLSLAM (host KF decisions): identical KF counts and matching
    trajectories — the scan mirrors KeyframeCriterion exactly."""
    cfg = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 512, "orb_nlevels": 3},
        "lines": {"max_lines": 64},
        # this scene promotes ~1 KF per 2 frames; keep the per-chunk KF
        # cap from binding so the drivers stay decision-identical
        "system": {"kf_batch": 6}})
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 10, 41
    seq = synthetic.make_sequence(cam, n_frames=n, seed=3, kind="loop",
                                  n_points=300, n_lines=40, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il, ir = u8(np.asarray(seq.images_l)), u8(np.asarray(seq.images_r))

    results = {}
    for cls in (FusedPLSLAM, ChunkedPLSLAM):
        slam = cls(cfg, cam)
        slam.initialize(il[0], ir[0])
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        est = slam.finish()
        results[cls.__name__] = (slam._kf_slot + 1, est)
    kfs_f, est_f = results["FusedPLSLAM"]
    kfs_c, est_c = results["ChunkedPLSLAM"]
    assert kfs_f == kfs_c, (kfs_f, kfs_c)
    a_f = float(ate_rmse(est_f, seq.poses[:len(est_f)]))
    a_c = float(ate_rmse(est_c, seq.poses[:len(est_c)]))
    assert abs(a_f - a_c) < 0.01, (a_f, a_c)
    assert a_f < 0.08, a_f


def test_fused_closes_synthetic_loop():
    """Loop closure end to end through the fused driver, including the
    per-chunk KF cap (KF-every-frame criterion with kf_batch=8 defers
    over-cap keyframes to the next chunk instead of dropping them)."""
    cfg = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},   # KF every frame
        "system": {"kf_batch": 8},
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0},
    })
    cam = StereoCamera.from_config(cfg.camera)
    n = 40
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    slam = FusedPLSLAM(cfg, cam, enable_loops=True)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for lo in (1, 14, 27):
        slam.process_chunk(seq.images_l[lo:lo + 13],
                           seq.images_r[lo:lo + 13])
    est = slam.finish()
    assert slam.loop_closer.n_loops_closed >= 1, "no loop closed"
    # KF cap: 13 candidate KFs/chunk but kf_batch=8 -> deferrals, and the
    # deferred criterion state fires on the following chunk
    assert 17 <= slam._kf_slot + 1 <= 27, slam._kf_slot + 1
    a = float(ate_rmse(est, seq.poses))
    assert a < 0.3, f"post-loop ATE {a:.3f} m"
    # device slot numbering stayed consistent with host bookkeeping
    slots = [r.slot for r in slam.summaries]
    assert slots == sorted(slots) and slots[-1] == slam._kf_slot


def test_step_cache_keyed_by_vocab_origin():
    """The fused-step program cache must key on the vocabularies' stable
    origin (artifact path/digest), not object identity: two Vocabulary
    objects loaded from the same artifact hit the same cached program,
    and differing origins miss."""
    from plslam_tpu.backend import fused_slam as fs
    from plslam_tpu.loop import vocabulary

    cfg = SlamConfig().with_updates({
        "camera": {"width": 256, "height": 192, "fx": 200.0, "fy": 200.0,
                   "cx": 128.0, "cy": 96.0, "baseline": 0.2},
        "points": {"max_kpts": 128, "orb_nlevels": 2},
        "lines": {"has_lines": False}})
    cam = StereoCamera.from_config(cfg.camera)

    rng = np.random.default_rng(0)
    desc = rng.integers(0, 2, (200, 256)).astype(np.uint8)
    v1 = vocabulary.build_vocabulary(desc, k=3, levels=2, seed=7)
    v2 = vocabulary.build_vocabulary(desc, k=3, levels=2, seed=7)
    v3 = vocabulary.build_vocabulary(desc, k=3, levels=2, seed=8)
    assert v1 is not v2 and v1.origin == v2.origin
    assert v1.origin != v3.origin

    s1 = fs.make_fused_slam_step(cam, cfg, 2, v1, None)
    s2 = fs.make_fused_slam_step(cam, cfg, 2, v2, None)
    s3 = fs.make_fused_slam_step(cam, cfg, 2, v3, None)
    assert s1 is s2          # same origin -> cache hit across objects
    assert s1 is not s3      # different vocabulary -> distinct program
    # bounded: the cache never exceeds its cap
    assert len(fs._STEP_CACHE) <= fs._STEP_CACHE_MAX


def test_online_pose_does_not_drain_pipeline():
    """online_pose() (default) must read only settled state — the
    depth-2 pipeline stays in flight; online_pose(drain=True) forces
    the full settle and reflects every submitted chunk."""
    cfg = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 256, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "loop": {"enabled": False}})
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 8, 41
    seq = synthetic.make_sequence(cam, n_frames=n, seed=4,
                                  n_points=300, n_lines=0, noise=0.003,
                                  step=0.2)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il, ir = u8(np.asarray(seq.images_l)), u8(np.asarray(seq.images_r))
    slam = FusedPLSLAM(cfg, cam)
    slam.initialize(il[0], ir[0])
    for lo in range(1, n, chunk):
        slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
    depth_before = len(slam._pending) + len(slam._upload_q)
    assert depth_before >= 1          # something is in flight
    pose_fast = slam.online_pose()
    assert len(slam._pending) + len(slam._upload_q) == depth_before, \
        "online_pose() drained the pipeline"
    assert pose_fast.shape == (4, 4)
    pose_exact = slam.online_pose(drain=True)
    assert len(slam._pending) == 0 and len(slam._upload_q) == 0
    # the fast pose is a valid (possibly stale) SE(3) estimate: same
    # trajectory up to the in-flight chunks
    d = float(np.linalg.norm(pose_exact[:3, 3] - pose_fast[:3, 3]))
    assert d < 2.0 * chunk * 0.2      # bounded by in-flight motion
    slam.close()
