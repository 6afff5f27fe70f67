"""Front-end + VO robustness on degraded imagery (VERDICT round-1 item 2:
all round-1 accuracy numbers came from clean flat-shaded renders; this
suite asserts the pipeline holds up under texture clutter, sensor noise,
motion blur, vignetting and exposure steps — the degradations EuRoC/
KITTI-grade imagery actually has; reference behavior bar: stvo-pl's
adaptive FAST + LSD robustness, stereoFrame.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.io.synthetic import Degradation
from plslam_tpu.utils.evaluation import ate_rmse

CFG = SlamConfig().with_updates({
    "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
               "cx": 256.0, "cy": 160.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 3},
    "matching": {"f2f_window": 128.0},
})
CAM = StereoCamera.from_config(CFG.camera)


def _stereo_counts(level: str, seed: int = 3):
    """(#valid point obs, #valid line obs) on one degraded stereo pair."""
    from plslam_tpu.tracking.batch_vo import extract_one
    seq = synthetic.make_sequence(CAM, n_frames=1, seed=seed,
                                  n_points=320, n_lines=50,
                                  degrade=Degradation.preset(level))
    pts, lns = extract_one(jnp.asarray(seq.images_l[0]),
                           jnp.asarray(seq.images_r[0]), CAM, CFG)
    return int(jnp.sum(pts.valid)), int(jnp.sum(lns.valid))


def test_stereo_extraction_survives_degradation():
    """The stereo front-end must keep producing usable observation
    counts at every degradation level (not collapse to zero)."""
    n_pt_clean, n_ln_clean = _stereo_counts("clean")
    assert n_pt_clean > 100 and n_ln_clean > 15, (n_pt_clean, n_ln_clean)
    for level, pt_frac, ln_frac in [("moderate", 0.5, 0.4),
                                    ("heavy", 0.3, 0.25)]:
        n_pt, n_ln = _stereo_counts(level)
        assert n_pt > pt_frac * n_pt_clean, (level, n_pt, n_pt_clean)
        assert n_ln > ln_frac * n_ln_clean, (level, n_ln, n_ln_clean)


def test_f2f_match_rate_under_degradation():
    """Frame-to-frame point matching must retain a usable inlier pool on
    degraded consecutive frames."""
    from plslam_tpu.tracking.batch_vo import extract_one
    from plslam_tpu.tracking.frame_handler import match_f2f_points
    for level, min_matches in [("clean", 60), ("moderate", 35),
                               ("heavy", 20)]:
        seq = synthetic.make_sequence(CAM, n_frames=2, seed=5,
                                      n_points=320, n_lines=40, step=0.2,
                                      degrade=Degradation.preset(level))
        p0, _ = extract_one(jnp.asarray(seq.images_l[0]),
                            jnp.asarray(seq.images_r[0]), CAM, CFG)
        p1, _ = extract_one(jnp.asarray(seq.images_l[1]),
                            jnp.asarray(seq.images_r[1]), CAM, CFG)
        mres = match_f2f_points(p0, p1, jnp.eye(4), CAM, CFG)
        n = int(jnp.sum(mres.valid & p0.valid))
        assert n >= min_matches, (level, n)


@pytest.mark.slow
def test_vo_ate_band_under_degradation():
    """Chunked point+line VO must hold the ATE band as degradation
    rises: the clean/moderate/heavy runs all stay under an absolute
    band, and moderate stays within 4x of clean."""
    from plslam_tpu.tracking.batch_vo import BatchedStereoVO
    n = 25
    ates = {}
    for level in ("clean", "moderate", "heavy"):
        seq = synthetic.make_sequence(CAM, n_frames=n, seed=11,
                                      n_points=380, n_lines=50, step=0.2,
                                      degrade=Degradation.preset(level))
        vo = BatchedStereoVO(CFG, CAM)
        vo.initialize(seq.images_l[0], seq.images_r[0])
        for lo in range(1, n, 8):
            vo.process_chunk(seq.images_l[lo:lo + 8],
                             seq.images_r[lo:lo + 8])
        est = np.stack(vo.trajectory)
        ates[level] = float(ate_rmse(est, seq.poses[:len(est)]))
    assert ates["clean"] < 0.05, ates
    assert ates["moderate"] < max(4 * ates["clean"], 0.12), ates
    assert ates["heavy"] < 0.35, ates


@pytest.mark.slow
def test_full_slam_ate_band_under_degradation():
    """FULL SLAM (fused driver: mapping + LBA + loop closure) must hold
    its ATE band under the extended degradation model (rolling shutter,
    per-eye speculars, dynamic occluders, L/R photometric asymmetry on
    top of texture/noise/blur/vignette/exposure) — the round-3 verdict's
    closest rig-compatible stand-in for the real-dataset gate."""
    from plslam_tpu.backend.fused_slam import FusedPLSLAM
    cfg = CFG.with_updates({
        "mapping": {"max_kfs": 64, "max_points": 8192, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},   # KF every frame
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0},
        "system": {"kf_batch": 6}})
    chunk, n = 10, 41
    stats = {}
    for level in ("clean", "moderate", "heavy"):
        seq = synthetic.make_sequence(CAM, n_frames=n, seed=21,
                                      kind="loop", n_points=700,
                                      n_lines=40, step=0.35,
                                      degrade=Degradation.preset(level))
        u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
        il, ir = u8(np.asarray(seq.images_l)), u8(np.asarray(seq.images_r))
        slam = FusedPLSLAM(cfg, CAM)
        slam.initialize(il[0], ir[0])
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        est = slam.finish()
        stats[level] = (float(ate_rmse(est, seq.poses[:len(est)])),
                        slam.loop_closer.n_loops_closed)
        slam.close()
    ates = {k: v[0] for k, v in stats.items()}
    assert ates["clean"] < 0.12, stats
    assert ates["moderate"] < 0.30, stats
    # heavy (rolling shutter + speculars + occluders + L/R asymmetry at
    # their max preset) drifts hard on this fast circle — the band is
    # wide, and the loop closures must be HELPING, not hurting
    # (measured: 0.90 with loops vs 1.16 loops-off at tuning time)
    assert ates["heavy"] < 1.1, stats
    # the loop must still close at every degradation level
    assert stats["clean"][1] >= 1, stats
    assert stats["moderate"][1] >= 1, stats
    assert stats["heavy"][1] >= 1, stats
