"""Synchronized per-chunk cycle ablation of the fused SLAM step.

block_until_ready on this tunnel runtime returns BEFORE device
completion, so the only trustworthy clock is a full device_get of the
program output. This tool runs the fused driver serialized (put ->
dispatch -> device_get per chunk) over a 100-frame loop sequence for
several config variants and prints the median per-chunk wall, which is
the honest device+fetch cost the pipelined driver must hide.

Usage: python prof_cycle.py [variant ...]  (default: all)
"""
import os
import sys
import time

import numpy as np


VARIANTS = {
    "full": {},
    "noloops": {"loop": {"enabled": False}},
    "nolba": {"mapping": {"lba_iters": 0}},
    "stride1": {"mapping": {"lba_kf_stride": 1}},
    "nolines": {"lines": {"has_lines": False}},
    "kf8": {"system": {"kf_batch": 8}},
    # no keyframes ever fire -> backend slots all skip: isolates
    # extraction + tracking + kf_scan from the mapping/probe work
    "nokf": {"keyframe": {"min_entropy_ratio": -1e9,
                          "max_kf_t_dist": 1e9, "max_kf_r_dist": 1e9}},
    "pass1": {"tracking": {"chunk_passes": 1}},
}


def run_variant(name: str, updates: dict) -> None:
    import jax
    import jax.numpy as jnp
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend.fused_slam import FusedPLSLAM

    cfg = SlamConfig()
    if updates:
        cfg = cfg.with_updates(updates)
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 20, 101
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l))
    ir = u8(np.asarray(seq.images_r))

    enable_loops = cfg.loop.enabled
    slam = FusedPLSLAM(cfg, cam, enable_loops=enable_loops)
    slam.initialize(il[0], ir[0])
    # warmup pass (compiles)
    for lo in range(1, n, chunk):
        slam._submit(il[lo:lo + chunk], ir[lo:lo + chunk], None)
        slam._settle_one()

    slam = FusedPLSLAM(cfg, cam, enable_loops=enable_loops)
    slam.initialize(il[0], ir[0])
    times = []
    for lo in range(1, n, chunk):
        t0 = time.perf_counter()
        slam._submit(il[lo:lo + chunk], ir[lo:lo + chunk], None)
        np.asarray(jax.device_get(slam._pending[-1].host_ref))
        slam._settle_one()
        times.append((time.perf_counter() - t0) * 1e3)
    ts = sorted(times)
    print(f"{name:10s} chunks(ms): " +
          " ".join(f"{t:7.1f}" for t in times) +
          f"   median {ts[len(ts)//2]:7.1f}  kfs={slam._kf_slot+1}")


def main():
    names = sys.argv[1:] or list(VARIANTS)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for name in names:
        run_variant(name, VARIANTS[name])


if __name__ == "__main__":
    main()
