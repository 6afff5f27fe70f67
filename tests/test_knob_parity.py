"""Accuracy-parity regression for the throughput knobs.

Round-3 introduced three device-throughput knobs whose accuracy cost
had only been measured ad hoc (VERDICT r3 #4): ``lba_kf_stride`` (LBA
every Nth KF instead of the reference's per-KF cadence —
mapHandler.cpp::localBundleAdjustment), ``lite_pass_iters`` (shortened
GN on non-final chunk passes) and ``kf_batch``. This long loopy
sequence pins their cost in CI: every variant must hold the baseline
variant's ATE band and close the same loops.

Runs in ONE fresh subprocess (all variants share the child): late in a
long pytest session jaxlib's CPU backend_compile segfaults on the next
large program (reproducible around the ~56th test across reorderings,
never in isolation); isolating the compile-heaviest modules sidesteps
the jaxlib bug without weakening any assertion.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from plslam_tpu.config import SlamConfig


BASE = SlamConfig().with_updates({
    "camera": {"width": 384, "height": 240, "fx": 300.0, "fy": 300.0,
               "cx": 192.0, "cy": 120.0, "baseline": 0.25},
    "points": {"max_kpts": 256, "orb_nlevels": 2},
    "lines": {"has_lines": False},       # scene renders no lines; keeps
                                         # the compile set shared with
                                         # tests/test_kf_capacity.SMALL
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
    "stride5": {"mapping": {"lba_kf_stride": 5}},   # sparse-LBA edge
    "no_lite": {"tracking": {"lite_pass_iters": 0}},
    "kf_batch2": {"system": {"kf_batch": 2}},       # tight-slot edge
    "kf_batch8": {"system": {"kf_batch": 8}},
}


def _child_main() -> None:
    """Runs every variant on the shared 501-frame loop scene and prints
    one JSON line of stats."""
    import jax
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend.fused_slam import FusedPLSLAM
    from plslam_tpu.utils.evaluation import ate_rmse

    cam = StereoCamera.from_config(BASE.camera)
    n, chunk = 501, 20
    seq = synthetic.make_sequence(cam, n_frames=n, seed=13, kind="loop",
                                  n_points=600, n_lines=0, noise=0.004,
                                  step=0.05)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l))
    ir = u8(np.asarray(seq.images_r))
    gt = np.asarray(seq.poses)

    stats = {}
    for name, upd in VARIANTS.items():
        cfg = BASE.with_updates(upd) if upd else BASE
        slam = FusedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        est = slam.finish()
        stats[name] = {"ate": float(ate_rmse(est, gt[:len(est)])),
                       "loops": slam.loop_closer.n_loops_closed,
                       "kfs": slam._kf_slot + 1}
        slam.close()
    print("KNOB_STATS " + json.dumps(stats))


@pytest.mark.slow
def test_knob_accuracy_parity():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.path.insert(0, {repo + '/tests'!r}); "
        "from test_knob_parity import _child_main; _child_main()")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("KNOB_STATS ")]
    assert line, r.stdout
    stats = json.loads(line[-1][len("KNOB_STATS "):])

    base = stats["baseline"]
    assert base["loops"] >= 1, stats
    assert base["ate"] < 0.30, stats
    # band tightened to the MEASURED envelope (VERDICT r4 item 7; was
    # 35%/2 cm, which a lite-pass-class regression (~13% ATE) cleared).
    # Measured on this scene (2026-08-21, seed 13, 501 frames, with the
    # round-5 lc_cooldown active): baseline 0.1508 m / 2 loops / 62 KFs;
    #   stride1 -3.3%; stride5 +0.05%; no_lite +0.2%; kf_batch8 +0.0%
    # — all within ~4%, so 15% (or 1 cm absolute, whichever is larger)
    # flags any lite-pass-class regression while riding out renderer
    # jitter. kf_batch2 measured +6.2% ATE with 51 KFs / 1 loop: at
    # chunk=20 the criterion wants >2 KFs per chunk, so the kf_batch
    # cap DEFERS keyframes every chunk (the driver warns) — the edge
    # point asserts that this documented under-provisioned mode stays
    # ATE-bounded, not that it preserves cadence.
    band = max(1.15 * base["ate"], base["ate"] + 0.01)
    for name in VARIANTS:
        if name == "baseline":
            continue
        v = stats[name]
        assert v["ate"] < band, (name, stats)
        if name == "kf_batch2":
            # deferral-limited cadence: fewer KFs/loops by design,
            # accuracy still inside the band (asserted above)
            assert v["loops"] >= 1, (name, stats)
            assert v["kfs"] <= base["kfs"], (name, stats)
            continue
        assert v["loops"] == base["loops"], (name, stats)
        # final-KF cadence within +-5% (was +-10%)
        assert abs(v["kfs"] - base["kfs"]) <= max(2, base["kfs"] // 20), \
            (name, stats)
