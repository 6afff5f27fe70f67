"""Accuracy-parity regression for the throughput knobs.

Round-3 introduced three device-throughput knobs whose accuracy cost
had only been measured ad hoc (VERDICT r3 #4): ``lba_kf_stride`` (LBA
every Nth KF instead of the reference's per-KF cadence —
mapHandler.cpp::localBundleAdjustment), ``lite_pass_iters`` (shortened
GN on non-final chunk passes) and ``kf_batch``. This long loopy
sequence pins their cost in CI: every variant must hold the baseline
variant's ATE band and close the same loops.
"""

import numpy as np
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.backend.fused_slam import FusedPLSLAM
from plslam_tpu.utils.evaluation import ate_rmse


BASE = SlamConfig().with_updates({
    "camera": {"width": 384, "height": 240, "fx": 300.0, "fy": 300.0,
               "cx": 192.0, "cy": 120.0, "baseline": 0.25},
    "points": {"max_kpts": 256, "orb_nlevels": 2},
    "lines": {"has_lines": False},
    "matching": {"f2f_window": 96.0},
    "mapping": {"max_kfs": 128, "max_points": 8192, "max_lines": 128,
                "window_kfs": 5, "fixed_kfs": 3, "lba_iters": 5,
                "lba_max_points": 2048, "lba_max_lines": 64},
    "loop": {"enabled": True, "min_kf_separation": 15,
             "consistency_window": 2, "lc_inl": 15,
             "lc_trs": 3.0, "lc_rot": 60.0},
    "system": {"kf_batch": 4},
})

VARIANTS = {
    "baseline": {},
    "stride1": {"mapping": {"lba_kf_stride": 1}},   # reference cadence
    "no_lite": {"tracking": {"lite_pass_iters": 0}},
    "kf_batch8": {"system": {"kf_batch": 8}},
}


@pytest.fixture(scope="module")
def long_loop_scene():
    cam = StereoCamera.from_config(BASE.camera)
    n = 501
    seq = synthetic.make_sequence(cam, n_frames=n, seed=13, kind="loop",
                                  n_points=600, n_lines=0, noise=0.004,
                                  step=0.05)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return (cam, n, u8(np.asarray(seq.images_l)),
            u8(np.asarray(seq.images_r)), np.asarray(seq.poses))


def _run(cfg, cam, n, il, ir):
    chunk = 20
    slam = FusedPLSLAM(cfg, cam)
    slam.initialize(il[0], ir[0])
    for lo in range(1, n, chunk):
        slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
    est = slam.finish()
    loops = slam.loop_closer.n_loops_closed
    kfs = slam._kf_slot + 1
    slam.close()
    return est, loops, kfs


@pytest.mark.slow
@pytest.mark.parametrize("name", list(VARIANTS))
def test_knob_accuracy_parity(long_loop_scene, name, request):
    cam, n, il, ir, gt = long_loop_scene
    cache = request.config.cache
    # baseline computed once per session and shared across params
    key = "knob_parity/baseline"
    base_stats = cache.get(key, None)
    if base_stats is None:
        est, loops, kfs = _run(BASE, cam, n, il, ir)
        base_stats = {"ate": float(ate_rmse(est, gt[:len(est)])),
                      "loops": loops, "kfs": kfs}
        cache.set(key, base_stats)
        assert loops >= 1, "scene must close at least one loop"
        assert base_stats["ate"] < 0.30, base_stats
    if name == "baseline":
        return
    cfg = BASE.with_updates(VARIANTS[name])
    est, loops, kfs = _run(cfg, cam, n, il, ir)
    ate = float(ate_rmse(est, gt[:len(est)]))
    # the stated band: a knob may not cost more than 35% ATE or 0.02 m
    # (whichever is larger) vs the baseline variant, and must close the
    # same number of loops
    band = max(1.35 * base_stats["ate"], base_stats["ate"] + 0.02)
    assert ate < band, (name, ate, base_stats)
    assert loops == base_stats["loops"], (name, loops, base_stats)
    assert abs(kfs - base_stats["kfs"]) <= max(3, base_stats["kfs"] // 10), \
        (name, kfs, base_stats)
