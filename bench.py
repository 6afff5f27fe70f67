"""Headline benchmark: stereo VO frames/sec on one TPU chip.

Runs the per-frame hot path (stereo feature extraction + f2f matching +
robust GN pose solve) at KITTI resolution on synthetic imagery, steady
state (post-compile), and prints ONE JSON line:

  {"metric": "vo_frames_per_sec_chip", "value": N, "unit": "fps",
   "vs_baseline": N}

vs_baseline is vs the reference PL-SLAM CPU frontend+tracking rate.
BASELINE.md: the reference runs ~30-60 ms/frame on a desktop CPU
(points+lines); we anchor on 22.5 fps (the midpoint, UNVERIFIED — see
BASELINE.md provenance) so vs_baseline = ours_fps / 22.5. The
BASELINE.json speed gate is >= 3x, i.e. vs_baseline >= 3.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS = 22.5  # PL-SLAM paper CPU rate (midpoint of 15-30; UNVERIFIED)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.core import lie
    from plslam_tpu.io import synthetic
    from plslam_tpu.frontend.stereo_points import extract_stereo_points
    from plslam_tpu.tracking.frame_handler import track_step

    # KITTI-like resolution; capacities as in the default config
    cfg = SlamConfig().with_updates({"lines": {"has_lines": False}})
    cam = StereoCamera.from_config(cfg.camera)

    n_frames = 12
    seq = synthetic.make_sequence(cam, n_frames=n_frames, seed=0,
                                  n_points=500, n_lines=0, noise=0.003,
                                  step=0.25)
    imgs_l = [jnp.asarray(x) for x in seq.images_l]
    imgs_r = [jnp.asarray(x) for x in seq.images_r]

    extract = jax.jit(lambda a, b: extract_stereo_points(a, b, cam, cfg))

    # warmup / compile
    prev = extract(imgs_l[0], imgs_r[0])
    cur = extract(imgs_l[1], imgs_r[1])
    out = track_step(prev, None, cur, None, jnp.eye(4), cam, cfg)
    jax.block_until_ready(out.pose.T)

    # steady-state timing over the sequence (device compute only)
    reps = 3
    t0 = time.perf_counter()
    n_steps = 0
    T_prior = jnp.eye(4)
    for _ in range(reps):
        prev = extract(imgs_l[0], imgs_r[0])
        for i in range(1, n_frames):
            cur = extract(imgs_l[i], imgs_r[i])
            out = track_step(prev, None, cur, None, T_prior, cam, cfg)
            prev = cur
            n_steps += 1
    jax.block_until_ready(out.pose.T)
    dt = time.perf_counter() - t0
    fps = n_steps / dt

    print(json.dumps({
        "metric": "vo_frames_per_sec_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
