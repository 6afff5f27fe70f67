"""CPU repro: KF-slot compaction + pressure eviction WITH loop closures
active (the combination the endurance bench exposed — lap-8 56 km
transient). Drives FusedPLSLAM through multiple compactions on a loopy
scene and reports trajectory sanity per chunk.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/plslam_tpu_xla_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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


def main():
    cam = StereoCamera.from_config(CFG.camera)
    lap = 40
    laps = int(os.environ.get("REPRO_LAPS", "4"))
    # exactly-periodic lap (same construction as bench_slam_long)
    yaw = 2.0 * np.pi / lap
    step = 0.3
    xi = np.array([0, 0, step, 0, yaw, 0], np.float32)
    S = synthetic._exp_se3_np(xi)
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
    chunk = 10
    slam = FusedPLSLAM(CFG, cam)
    slam.initialize(il[0], ir[0])
    events = []
    for g in range(1, n, chunk):
        idx = (np.arange(g, g + chunk)) % lap
        slam.process_chunk(il[idx], ir[idx])
        p = slam.online_pose()
        events.append((g, float(np.abs(p[:3, 3]).max()),
                       slam.n_compactions, len(slam.eviction_events),
                       slam.loop_closer.n_loops_closed))
    est = slam.finish()
    mx = np.abs(est[:, :3, 3]).max(axis=-1)
    a = ate_rmse(est, poses[:len(est)])
    print("chunk  |pos|max  compactions evictions loops")
    for g, pm, nc, ne, nl in events:
        flag = "  <-- BLOWUP" if pm > 10 * R_cam else ""
        print(f"{g:5d}  {pm:10.2f}  {nc} {ne} {nl}{flag}")
    print(f"final: ATE {a:.3f} m, max|pos| {mx.max():.1f} "
          f"(R_cam {R_cam:.1f}), kfs_inserted {len(slam.summaries) + 1}, "
          f"compactions {slam.n_compactions}, "
          f"evicted {slam.n_evicted_kfs}, "
          f"loops {slam.loop_closer.n_loops_closed}")
    bad = mx.max() > 10 * R_cam or a > 5.0
    print("REPRO_FAIL" if bad else "REPRO_OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
