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
