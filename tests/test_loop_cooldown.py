"""Post-closure lockout (loop.lc_cooldown): during a sustained revisit
every keyframe is a valid loop candidate, but re-closing an
already-corrected loop buys ~zero accuracy while each closure pays a
pose-graph solve + correction program. The cooldown suppresses
candidate selection for N keyframes after a closure (the DBoW2-era
standard, e.g. ORB-SLAM's 10-KF lockout). Endurance runs
(bench_slam_long.py) depend on it: an exactly-periodic revisit without
the lockout fires ~one closure per keyframe.
"""

import numpy as np

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic


def _run(cfg, cam, seq, n):
    from plslam_tpu.backend.slam_system import PLSLAM
    slam = PLSLAM(cfg, cam)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, n):
        slam.process(seq.images_l[i], seq.images_r[i])
    est = slam.finish()
    from plslam_tpu.utils.evaluation import ate_rmse
    return (slam.loop_closer.n_loops_closed,
            float(ate_rmse(est, seq.poses[:len(est)])))


def test_cooldown_suppresses_redundant_closures():
    """On a loop scene that keeps revisiting, cooldown=0 must close
    MORE loops than a large cooldown, while accuracy stays in the same
    band (the suppressed closures were redundant)."""
    base = SlamConfig().with_updates({
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
    cam = StereoCamera.from_config(base.camera)
    # 52 frames: the circle closes around frame ~44 and keeps revisiting
    n = 52
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    loops_hot, ate_hot = _run(base.with_updates(
        {"loop": {"lc_cooldown": 0}}), cam, seq, n)
    loops_cool, ate_cool = _run(base.with_updates(
        {"loop": {"lc_cooldown": 100}}), cam, seq, n)
    assert loops_cool >= 1, "cooldown must not suppress the FIRST closure"
    assert loops_hot > loops_cool, (loops_hot, loops_cool)
    # suppressed re-closures were redundant: accuracy band unchanged
    assert ate_cool < max(2.0 * ate_hot, ate_hot + 0.05), (
        ate_hot, ate_cool)
