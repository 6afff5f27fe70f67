"""Regression: KF-slot compaction + pressure eviction WITH loop
closures active.

The round-5 endurance bench exposed a class of failures in exactly
this combination (the soak in test_kf_capacity runs loops OFF):
cost-neutral floating variables in the window LBA (poses/landmarks
whose support was detached by eviction or fusion chains) random-walked
to absurd positions, and non-transitive fusion remaps could re-bind
stale observations to recycled landmark slots. The fixes live in
backend/lba.py (support-gated pins), loop/pose_graph.py (gauge-
component freeze) and backend/map.py (transitive fusion remap); this
test drives the fused driver through multiple compaction + eviction +
closure cycles and requires the trajectory to stay sane.

Runs in a fresh subprocess (compile-heavy, like the capacity soak).
"""

import json
import os
import subprocess
import sys

import pytest


def _child_main() -> None:
    import numpy as np
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend.fused_slam import FusedPLSLAM
    from plslam_tpu.utils.evaluation import ate_rmse

    CFG = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},      # KF every frame
        "system": {"async_mapping": False, "kf_batch": 4},
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0, "lc_cooldown": 5},
    })
    cam = StereoCamera.from_config(CFG.camera)
    lap, laps, chunk = 40, 7, 10
    yaw, step = 2.0 * np.pi / lap, 0.3
    S = synthetic._exp_se3_np(
        np.array([0, 0, step, 0, yaw, 0], np.float32))
    T = np.eye(4, dtype=np.float32)
    lap_poses = []
    for _ in range(lap):
        lap_poses.append(T)
        T = (T @ S).astype(np.float32)
    lap_poses = np.stack(lap_poses)
    poses = np.concatenate([lap_poses] * laps + [lap_poses[:1]])
    center = lap_poses[:, :3, 3].mean(0)
    R_cam = float(np.linalg.norm(lap_poses[0, :3, 3] - center))

    rng = np.random.default_rng(3)
    n_pts = 700
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    rad = rng.uniform(max(R_cam - 8.0, 1.5), R_cam + 10.0, n_pts)
    pts = np.stack([center[0] + rad * np.sin(ang),
                    rng.uniform(-2.5, 2.5, n_pts),
                    center[2] + rad * np.cos(ang)], -1).astype(np.float32)
    world = synthetic.SyntheticWorld(
        pts, np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
        rng.integers(0, 2 ** 31 - 1, n_pts))
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = np.empty((lap, cam.height, cam.width), np.uint8)
    ir = np.empty_like(il)
    for i in range(lap):
        l_, r_ = synthetic.render_frame(world, lap_poses[i], cam, rng,
                                        noise=0.004)
        il[i], ir[i] = u8(l_), u8(r_)

    n = laps * lap + 1
    slam = FusedPLSLAM(CFG, cam)
    slam.initialize(il[0], ir[0])
    for g in range(1, n, chunk):
        idx = (np.arange(g, g + chunk)) % lap
        slam.process_chunk(il[idx], ir[idx])
    est = slam.finish()
    out = {
        "ate": float(ate_rmse(est, poses[:len(est)])),
        "max_pos": float(np.abs(est[:, :3, 3]).max()),
        "R_cam": R_cam,
        "compactions": slam.n_compactions,
        "evicted": slam.n_evicted_kfs,
        "loops": slam.loop_closer.n_loops_closed,
    }
    print("COMPACT_LOOPS " + json.dumps(out))


@pytest.mark.slow
def test_compaction_with_closures_stays_sane():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.path.insert(0, {repo + '/tests'!r}); "
        "from test_compact_loops import _child_main; _child_main()")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("COMPACT_LOOPS ")]
    assert line, r.stdout
    s = json.loads(line[-1][len("COMPACT_LOOPS "):])
    # the machinery must actually have fired
    assert s["compactions"] >= 2, s
    assert s["evicted"] >= 8, s
    assert s["loops"] >= 5, s
    # and the trajectory must stay sane through all of it: no
    # floating-variable catapults (the estimated path stays within a
    # few circuit radii) and the ATE inside the accuracy band
    assert s["max_pos"] < 5 * s["R_cam"], s
    assert s["ate"] < 1.0, s
