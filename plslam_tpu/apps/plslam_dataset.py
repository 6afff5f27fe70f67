"""Full SLAM CLI: stereo point-line SLAM with mapping (+ loop closure).

Reference parity: pl-slam ``app/plslam_dataset.cpp`` — wires
Dataset -> StVO -> MapHandler (-> loop closure), prints per-stage
timings and KF/landmark/loop events, saves the trajectory, reports ATE
against ground truth when available.

Usage:
  python -m plslam_tpu.apps.plslam_dataset <dataset_dir> [options]
  python -m plslam_tpu.apps.plslam_dataset --synthetic [options]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from plslam_tpu.apps.plstvo_dataset import (build_argparser, load_config,
                                            open_frames, save_tum)


def _main_chunked(args, cfg, ds) -> int:
    """Chunked full SLAM: B frames per device dispatch. Default driver is
    the fully-fused one (backend.fused_slam — tracking + in-program KF
    criterion + mapping + BoW probe in ONE program per chunk, one packed
    fetch); ``system.fused_slam: false`` selects the host-KF-decision
    driver with the mapping worker thread instead."""
    import numpy as np
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.utils.evaluation import ate_rmse, rpe

    cam = StereoCamera.from_config(ds.camera)
    resumed = False
    if cfg.system.fused_slam:
        from plslam_tpu.backend.fused_slam import FusedPLSLAM
        if getattr(args, "resume", None):
            slam = FusedPLSLAM.resume(args.resume, cam,
                                      enable_loops=not args.no_loops)
            resumed = True
            print(f"resumed from {args.resume}: "
                  f"{len(slam.trajectory)} frames, "
                  f"{slam._kf_slot + 1} KFs in map")
        else:
            slam = FusedPLSLAM(cfg, cam, enable_loops=not args.no_loops)
    else:
        if getattr(args, "resume", None):
            print("--resume requires the fused driver "
                  "(system.fused_slam=true)", file=sys.stderr)
            return 2
        from plslam_tpu.backend.slam_system import ChunkedPLSLAM
        slam = ChunkedPLSLAM(cfg, cam, enable_loops=not args.no_loops)
    n = len(ds)
    B = args.chunk
    if resumed:
        i = len(slam.trajectory)    # continue after the last saved frame
        if i >= n:
            print("checkpoint already covers the whole sequence")
    else:
        img_l, img_r = ds.frame(0)
        slam.initialize(img_l, img_r)
        i = 1
    t_start = None
    n_timed = 0
    def as_u8(frames):
        # 8-bit transport: 4x less host->device traffic (see vo_chunk)
        return np.stack([np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8)
                         for f in frames])

    while i < n:
        j = min(i + B, n)
        ls, rs = zip(*(ds.frame(k) for k in range(i, j)))
        n_real = j - i
        if n_real < B:
            ls = ls + (ls[-1],) * (B - n_real)
            rs = rs + (rs[-1],) * (B - n_real)
        slam.process_chunk(as_u8(ls), as_u8(rs), n_valid=n_real)
        if t_start is None:
            t_start = time.perf_counter()     # first chunk = compile warmup
        else:
            n_timed += n_real
        i = j
    est = slam.finish()
    wall = time.perf_counter() - t_start if t_start else 0.0
    fps = n_timed / wall if wall > 0 and n_timed else float("nan")

    n_pts, n_lns = (slam.map.n_landmarks() if hasattr(slam, "map")
                    else slam.n_landmarks())
    n_loops = slam.loop_closer.n_loops_closed if slam.loop_closer else 0
    mode = "fused" if cfg.system.fused_slam else "chunked"
    print(f"\nPL-SLAM ({mode} B={B}): {n} frames, {slam._kf_slot + 1} KFs, "
          f"{n_pts} map points, {n_lns} map lines, {n_loops} loops, "
          f"{fps:.1f} fps (wall, steady-state incl. IO + mapping)")
    if ds.gt_poses is not None:
        a = ate_rmse(est, ds.gt_poses[:len(est)])
        t_r, r_r = rpe(est, ds.gt_poses[:len(est)])
        print(f"ATE RMSE: {a:.4f} m | RPE: {t_r:.4f} m / "
              f"{np.rad2deg(r_r):.4f} deg")
        from plslam_tpu.utils.evaluation import kitti_odometry_error
        t_pct, r_dm, n_seg = kitti_odometry_error(est, ds.gt_poses[:len(est)])
        if n_seg:   # needs >= 100 m of ground-truth path
            print(f"KITTI odometry error: {t_pct:.2f} % / "
                  f"{r_dm:.4f} deg/m over {n_seg} segments")
    if args.out:
        save_tum(args.out, est)
        print("trajectory saved to", args.out)
    # deployment-path parity with the per-frame driver: the fused path
    # renders and persists too (slamScene + finishSLAM outputs)
    if getattr(args, "viz", None):
        from plslam_tpu.utils.viz import plot_map_handler
        gt = ds.gt_poses[:len(est)] if ds.gt_poses is not None else None
        holder = slam if hasattr(slam, "state") else slam.map
        plot_map_handler(holder, path=args.viz, gt_poses=gt,
                         loop_closer=slam.loop_closer)
        print("scene rendered to", args.viz)
    if getattr(args, "checkpoint", None):
        if hasattr(slam, "save_checkpoint"):
            slam.save_checkpoint(args.checkpoint)
        else:
            from plslam_tpu.backend.checkpoint import save_map
            save_map(args.checkpoint, slam.map.state, cfg,
                     extra={"trajectory": est})
        print("map checkpoint saved to", args.checkpoint)
    return 0


def main(argv=None) -> int:
    ap = build_argparser(__doc__)
    ap.add_argument("--no-loops", action="store_true",
                    help="disable loop closure")
    ap.add_argument("--sync", action="store_true",
                    help="synchronous mapping (no mapping thread)")
    ap.add_argument("--viz", default=None, metavar="PNG",
                    help="render the final 3D scene to this PNG")
    ap.add_argument("--checkpoint", default=None, metavar="NPZ",
                    help="save the final map state to this npz")
    ap.add_argument("--resume", default=None, metavar="NPZ",
                    help="resume a fused-driver run from this checkpoint "
                         "(continues after its last saved frame)")
    args = ap.parse_args(argv)
    cfg = load_config(args)
    if args.sync:
        cfg = cfg.with_updates({"system": {"async_mapping": False}})
    if args.no_loops:
        cfg = cfg.with_updates({"loop": {"enabled": False}})
    ds = open_frames(args, cfg)
    if args.chunk > 0:
        return _main_chunked(args, cfg, ds)

    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.backend.slam_system import PLSLAM
    from plslam_tpu.utils.evaluation import ate_rmse, rpe
    from plslam_tpu.utils.timing import StageTimer
    import jax.numpy as jnp

    cam = StereoCamera.from_config(ds.camera)
    slam = PLSLAM(cfg, cam)
    timer = StageTimer()

    n = len(ds)
    img_l, img_r = ds.frame(0)
    slam.initialize(img_l, img_r)
    from plslam_tpu.utils.timing import maybe_profile
    t_start = time.perf_counter()
    n_good = 0
    n_kfs = 1
    with maybe_profile(args.profile):
        for i in range(1, n):
            timer.start("io")
            img_l, img_r = ds.frame(i)
            timer.stop("io")
            timer.start("frame")
            out = slam.process(img_l, img_r)
            timer.stop("frame", jnp.asarray(out.frame.T_wc))
            fr = out.frame
            n_good += int(fr.good)
            if out.kf_slot is not None:
                n_kfs += 1
            if not args.quiet and (i % 10 == 0 or not fr.good):
                t = fr.T_wc[:3, 3]
                print(f"[{i:4d}/{n}] good={fr.good} inl={fr.n_inliers:4d} "
                      f"kf={out.kf_slot is not None} "
                      f"t=({t[0]:+.2f},{t[1]:+.2f},{t[2]:+.2f})")
    est = slam.finish()
    wall = time.perf_counter() - t_start

    n_pts, n_lns = slam.map.n_landmarks()
    n_loops = 0
    if slam.loop_closer is not None:
        n_loops = slam.loop_closer.n_loops_closed
    print(f"\nPL-SLAM: {n} frames, {n_good}/{n-1} tracked, {n_kfs} KFs, "
          f"{n_pts} map points, {n_lns} map lines, {n_loops} loops, "
          f"{(n-1)/wall:.1f} fps (wall)")
    print("stage timing:", timer.report())
    if ds.gt_poses is not None:
        a = ate_rmse(est, ds.gt_poses[:len(est)])
        t_r, r_r = rpe(est, ds.gt_poses[:len(est)])
        print(f"ATE RMSE: {a:.4f} m | RPE: {t_r:.4f} m / {np.rad2deg(r_r):.4f} deg")
    if args.out:
        save_tum(args.out, est)
        print("trajectory saved to", args.out)
    if args.viz:
        from plslam_tpu.utils.viz import plot_map_handler
        gt = ds.gt_poses[:len(est)] if ds.gt_poses is not None else None
        plot_map_handler(slam.map, path=args.viz, gt_poses=gt,
                         loop_closer=slam.loop_closer)
        print("scene rendered to", args.viz)
    if args.checkpoint:
        from plslam_tpu.backend.checkpoint import save_map
        save_map(args.checkpoint, slam.map.state, cfg,
                 extra={"trajectory": est})
        print("map checkpoint saved to", args.checkpoint)
    return 0


if __name__ == "__main__":
    sys.exit(main())
