"""Chunked full-SLAM driver: B frames per dispatch + host KF decisions
+ mapping on sliced device features must reproduce the per-frame system."""

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.backend.slam_system import PLSLAM, ChunkedPLSLAM
from plslam_tpu.utils.evaluation import ate_rmse

CFG = SlamConfig().with_updates({
    "camera": {"width": 640, "height": 384, "fx": 450.0, "fy": 450.0,
               "cx": 320.0, "cy": 192.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 2},
    "lines": {"has_lines": False},
    "system": {"async_mapping": False},
    "loop": {"enabled": False},
    "keyframe": {"min_entropy_ratio": 0.9},
})
CAM = StereoCamera.from_config(CFG.camera)


def test_chunked_slam_tracks_and_maps():
    seq = synthetic.make_sequence(CAM, n_frames=13, seed=2, n_points=300,
                                  n_lines=0, noise=0.003, step=0.2)
    slam = ChunkedPLSLAM(CFG, CAM, enable_loops=False)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    slam.process_chunk(seq.images_l[1:7], seq.images_r[1:7])
    slam.process_chunk(seq.images_l[7:13], seq.images_r[7:13])
    est = slam.finish()

    assert est.shape == (13, 4, 4)
    assert slam._kf_slot >= 1, "no keyframes promoted"
    n_pts, _ = slam.map.n_landmarks()
    assert n_pts > 50, f"map too sparse: {n_pts}"
    a = ate_rmse(est, seq.poses)
    assert a < 0.08, a


def test_chunked_slam_matches_per_frame_quality():
    """Same scene through both drivers: comparable trajectory quality
    (not identical — KF entropy statistics see per-frame vs chunk-fetch
    ordering differently, but both must stay within the ATE band)."""
    seq = synthetic.make_sequence(CAM, n_frames=13, seed=4, n_points=300,
                                  n_lines=0, noise=0.003, step=0.2)
    ref = PLSLAM(CFG, CAM, enable_loops=False)
    ref.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, 13):
        ref.process(seq.images_l[i], seq.images_r[i])
    est_ref = ref.finish()

    ch = ChunkedPLSLAM(CFG, CAM, enable_loops=False)
    ch.initialize(seq.images_l[0], seq.images_r[0])
    for lo in (1, 7):
        ch.process_chunk(seq.images_l[lo:lo + 6], seq.images_r[lo:lo + 6])
    est_ch = ch.finish()

    a_ref = ate_rmse(est_ref, seq.poses)
    a_ch = ate_rmse(est_ch, seq.poses)
    assert a_ch < max(2.5 * a_ref, 0.08), (a_ch, a_ref)


def test_chunked_slam_closes_synthetic_loop():
    """The chunked driver must fire loop closure end to end (loop checks
    ride the mapping worker via the on_done hook)."""
    cfg = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},   # KF every frame
        "system": {"async_mapping": True},
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0},
    })
    cam = StereoCamera.from_config(cfg.camera)
    n = 40
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    slam = ChunkedPLSLAM(cfg, cam, enable_loops=True)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for lo in (1, 14, 27):
        slam.process_chunk(seq.images_l[lo:lo + 13], seq.images_r[lo:lo + 13])
    est = slam.finish()
    assert slam.loop_closer.n_loops_closed >= 1, "no loop closed"
    a = ate_rmse(est, seq.poses)
    assert a < 0.3, f"post-loop ATE {a:.3f} m"


def test_online_pose_reflects_midrun_loop_closure():
    """The ONLINE pose (not the post-hoc finish() trajectory) must pick
    up a mid-run loop correction: after closures fire, the map-consistent
    online pose is closer to ground truth than the raw integrated
    tracker pose."""
    cfg = SlamConfig().with_updates({
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
                 "lc_trs": 3.0, "lc_rot": 60.0},
    })
    cam = StereoCamera.from_config(cfg.camera)
    n = 40
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    slam = ChunkedPLSLAM(cfg, cam, enable_loops=True)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for lo in (1, 14, 27):
        slam.process_chunk(seq.images_l[lo:lo + 13], seq.images_r[lo:lo + 13])
    while slam._inflight:
        slam._settle_one()
    slam.map.wait_idle()
    assert slam.loop_closer.n_loops_closed >= 1

    gt = seq.poses[len(slam.vo.trajectory) - 1]
    raw = slam.vo.T_wc
    online = slam.online_pose()
    kf_slot = slam._kf_slot
    T_kf = slam.map.latest_kf_pose(kf_slot)
    slam.map.close()
    # the online pose picked up the back-end corrections: it composes
    # from the CORRECTED latest-KF pose (so it differs from the raw
    # integration by the applied correction) and stays accurate
    pickup = float(np.linalg.norm(online[:3, 3] - raw[:3, 3]))
    assert pickup > 0.03, f"no correction picked up ({pickup:.3f} m)"
    expect = T_kf @ (np.linalg.inv(slam._T_kf_at_insert) @ raw)
    np.testing.assert_allclose(online, expect, atol=1e-5)
    e_onl = float(np.linalg.norm(online[:3, 3] - gt[:3, 3]))
    assert e_onl < 0.35, e_onl


def test_concurrent_multi_sequence_sessions():
    """Staged config 5 (concurrent sequences): two independent SLAM
    sessions interleaved chunk-by-chunk must each produce an accurate
    trajectory — maps, workers and loop state fully isolated."""
    from plslam_tpu.apps.plslam_multiseq import run_concurrent
    from plslam_tpu.utils.evaluation import ate_rmse
    cfg = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 32, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "loop": {"enabled": False},
    })
    cam = StereoCamera.from_config(cfg.camera)
    seqs = [synthetic.make_sequence(cam, n_frames=17, seed=30 + s,
                                    kind="forward", n_points=400,
                                    n_lines=0, noise=0.004, step=0.2)
            for s in range(2)]
    slams = [ChunkedPLSLAM(cfg, cam, enable_loops=False) for _ in range(2)]
    trajs = run_concurrent(slams, seqs, chunk=8)
    for traj, seq in zip(trajs, seqs):
        assert len(traj) == 17
        a = float(ate_rmse(traj, seq.poses[:len(traj)]))
        assert a < 0.08, a
