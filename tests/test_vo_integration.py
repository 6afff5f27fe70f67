"""End-to-end stereo point VO on a synthetic sequence (BASELINE config 1:
'stereo point-only visual odometry ... frame-to-frame GN pose solve')."""

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.tracking.frame_handler import StereoVO
from plslam_tpu.utils.evaluation import ate_rmse, rpe

CFG = SlamConfig().with_updates({
    "camera": {"width": 640, "height": 384, "fx": 450.0, "fy": 450.0,
               "cx": 320.0, "cy": 192.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 2},
    "lines": {"has_lines": False},
})
CAM = StereoCamera.from_config(CFG.camera)


@pytest.fixture(scope="module")
def result():
    seq = synthetic.make_sequence(CAM, n_frames=10, seed=7, n_points=260,
                                  n_lines=0, noise=0.003, step=0.12)
    vo = StereoVO(CFG, CAM)
    vo.initialize(seq.images_l[0], seq.images_r[0])
    frames = [vo.insert_stereo_pair(seq.images_l[i], seq.images_r[i])
              for i in range(1, len(seq.images_l))]
    return seq, vo, frames


def test_tracking_succeeds(result):
    seq, vo, frames = result
    good = [f.good for f in frames]
    assert np.mean(good) >= 0.9, f"tracking failed on {good}"
    assert all(f.n_inliers >= 20 for f in frames if f.good)


def test_trajectory_accuracy(result):
    seq, vo, frames = result
    est = np.stack(vo.trajectory)
    gt = seq.poses
    a = ate_rmse(est, gt)
    # ~1.2m of total motion; a few cm ATE is sanity, not the perf bar
    assert a < 0.05, f"ATE {a:.3f} m"
    t_rpe, r_rpe = rpe(est, gt)
    assert t_rpe < 0.02, f"RPE trans {t_rpe:.4f} m"
    assert r_rpe < 0.01, f"RPE rot {r_rpe:.5f} rad"


def test_keyframe_logic_triggers_on_motion():
    """Large jumps must trigger the translation-cap KF criterion."""
    seq = synthetic.make_sequence(CAM, n_frames=4, seed=8, n_points=260,
                                  n_lines=0, noise=0.003, step=2.8)
    vo = StereoVO(CFG.with_updates({"keyframe": {"max_kf_t_dist": 2.0}}), CAM)
    vo.initialize(seq.images_l[0], seq.images_r[0])
    kfs = [vo.insert_stereo_pair(seq.images_l[i], seq.images_r[i]).is_kf
           for i in range(1, 4)]
    assert any(kfs)
