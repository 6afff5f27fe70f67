"""Extraction-stage attribution with DCE-proof checksum outputs. Ad hoc."""
import os
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
    from plslam_tpu.frontend.stereo_points import (detect_and_describe,
                                                   extract_stereo_points)
    from plslam_tpu.frontend.stereo_lines import detect_and_describe_lines
    from plslam_tpu.ops import lines as OL

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    B = 20
    seq = synthetic.make_sequence(cam, n_frames=B, seed=0, n_points=500,
                                  n_lines=60, noise=0.003, step=0.25)
    il = jnp.asarray(np.stack(seq.images_l))
    ir = jnp.asarray(np.stack(seq.images_r))

    def checksum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def bench(f, iters=6):
        jf = jax.jit(lambda i: f(jnp.roll(il, i, 0), ir))
        jax.device_get(jf(0))
        t0 = time.perf_counter()
        for i in range(iters):
            jax.device_get(jf(i % 3 + 1))
        return (time.perf_counter() - t0) / iters

    floor = bench(lambda a, b: a[:2, :8, :8])

    H, W = cfg.camera.height, cfg.camera.width
    diag = (H * H + W * W) ** 0.5
    l = cfg.lines

    stages = {
        "detect_segments": lambda a, b: checksum(jax.vmap(
            lambda x: OL.detect_segments(
                x, max_lines=l.max_lines, tile=l.tile,
                grad_th=l.grad_th / 255.0,
                merge_iters=max(l.merge_iters * 3, 8),
                merge_ang_th=l.merge_ang_th, merge_dist_th=l.merge_dist_th,
                min_length=l.min_line_length * diag)
        )(jnp.concatenate([a, b]))),
        "lines det+LBD": lambda a, b: checksum(jax.vmap(
            lambda x: detect_and_describe_lines(x, cfg)
        )(jnp.concatenate([a, b]))),
        "pts det+desc": lambda a, b: checksum(jax.vmap(
            lambda x: detect_and_describe(x, cfg)
        )(jnp.concatenate([a, b]))),
        "pts + stereo": lambda a, b: checksum(jax.vmap(
            lambda x, y: extract_stereo_points(x, y, cam, cfg))(a, b)),
        "frame full": lambda a, b: checksum(jax.vmap(
            lambda x, y: extract_stereo_frame(x, y, cam, cfg))(a, b)),
    }
    print(f"rig floor        : {floor*1e3:8.2f} ms/call")
    for name, f in stages.items():
        t = bench(f)
        print(f"{name:17s}: {t*1e3:8.2f} ms/call  "
              f"[{(t-floor)*1e3/B:6.3f} ms/frame]")


if __name__ == "__main__":
    main()
