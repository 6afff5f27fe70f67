"""Concurrent multi-sequence SLAM (BASELINE staged config 5: concurrent
sequences, e.g. "KITTI 00+02", sharing the accelerator).

The reference is strictly one-process-one-sequence; this driver runs N
independent SLAM sessions — each with its own map, loop closer and
mapping worker — interleaving their tracking chunks in the device
stream. Chunked dispatch makes the sessions' programs queue behind one
another instead of idling the chip between a single session's host
phases, so aggregate throughput exceeds running them back to back. The
distributed-BA half of config 5 (each session's LBA windows batched
over the 'kf' mesh axis, landmark-sharded over 'lm') is
parallel.dist_lba.make_dist_lba_step_dp, exercised by tests and the
multichip dryrun.

Usage:
  python -m plslam_tpu.apps.plslam_multiseq --synthetic --sequences 2 \
      --frames 80 --chunk 20
"""

from __future__ import annotations

import argparse
import time
from typing import List

import numpy as np


def run_concurrent(slams: List, sequences: List, chunk: int) -> List[np.ndarray]:
    """Interleave the sequences' chunks; returns per-session trajectories."""
    n_frames = min(len(s.images_l) for s in sequences)
    for slam, seq in zip(slams, sequences):
        slam.initialize(seq.images_l[0], seq.images_r[0])
    for lo in range(1, n_frames, chunk):
        for slam, seq in zip(slams, sequences):
            slam.process_chunk(seq.images_l[lo:lo + chunk],
                               seq.images_r[lo:lo + chunk])
    return [slam.finish() for slam in slams]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--sequences", type=int, default=2)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--no-loops", action="store_true")
    ap.add_argument("--distributed", action="store_true",
                    help="route every session's window LBA through the "
                         "owner-sharded multi-device solver "
                         "(mapping.distributed; the full staged config "
                         "5: concurrent sequences AND sharded BA in one "
                         "runtime — on this rig over the simulated CPU "
                         "mesh, on a pod over ICI)")
    args = ap.parse_args()

    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.utils.evaluation import ate_rmse

    cfg = SlamConfig()
    if args.distributed:
        # the sharded LBA lives on the per-KF mapping path; the
        # per-frame PLSLAM driver routes every window solve through
        # backend.map_handler.mapping_step_distributed (sync mapping:
        # the sharded program IS the concurrency story here)
        cfg = cfg.with_updates({"mapping": {"distributed": True},
                                "system": {"async_mapping": False}})
    Driver = None
    if not args.distributed:
        if cfg.system.fused_slam:
            from plslam_tpu.backend.fused_slam import FusedPLSLAM as Driver
        else:
            from plslam_tpu.backend.slam_system import ChunkedPLSLAM as Driver
    cam = StereoCamera.from_config(cfg.camera)
    seqs = [synthetic.make_sequence(cam, n_frames=args.frames, seed=10 + s,
                                    kind="loop" if s % 2 else "forward",
                                    n_points=400, n_lines=60, noise=0.004,
                                    step=0.15)
            for s in range(args.sequences)]
    if args.distributed:
        from plslam_tpu.backend.slam_system import PLSLAM
        slams = [PLSLAM(cfg, cam) for _ in range(args.sequences)]
        t0 = time.perf_counter()
        n_frames = min(len(s.images_l) for s in seqs)
        for slam, seq in zip(slams, seqs):
            slam.initialize(seq.images_l[0], seq.images_r[0])
        for i in range(1, n_frames):
            for slam, seq in zip(slams, seqs):   # interleave sessions
                slam.process(seq.images_l[i], seq.images_r[i])
        trajs = [slam.finish() for slam in slams]
        wall = time.perf_counter() - t0
    else:
        slams = [Driver(cfg, cam, enable_loops=not args.no_loops)
                 for _ in range(args.sequences)]
        t0 = time.perf_counter()
        trajs = run_concurrent(slams, seqs, args.chunk)
        wall = time.perf_counter() - t0
    total = sum(len(t) for t in trajs)
    for s, (traj, seq) in enumerate(zip(trajs, seqs)):
        a = ate_rmse(traj, seq.poses[:len(traj)])
        nl = slams[s].loop_closer.n_loops_closed if slams[s].loop_closer else 0
        print(f"seq {s}: {len(traj)} frames, ATE {a:.4f} m, loops {nl}")
    print(f"aggregate: {total} frames in {wall:.2f}s = "
          f"{total / wall:.1f} fps across {args.sequences} sessions")


if __name__ == "__main__":
    main()
