"""Ad-hoc stage profiler for the chunked VO hot path (real TPU).

Times, per frame at KITTI resolution: full vo_chunk, batched point
extraction, batched line extraction, and the tracking scan — to direct
kernel-level optimization work. Not part of the test suite.
"""
import os
import time

import numpy as np


def bench_fn(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from functools import partial
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.frontend.stereo_points import (detect_and_describe,
                                                   extract_stereo_points)
    from plslam_tpu.frontend.stereo_lines import detect_and_describe_lines
    from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
    from plslam_tpu.ops import fast as fast_ops
    from plslam_tpu.tracking.batch_vo import vo_chunk, extract_one

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    chunk = 20
    seq = synthetic.make_sequence(cam, n_frames=chunk + 1, seed=0,
                                  n_points=500, n_lines=60, noise=0.003,
                                  step=0.25)
    il = jnp.asarray(np.stack(seq.images_l[1:]))
    ir = jnp.asarray(np.stack(seq.images_r[1:]))
    print("img dtype/shape:", il.dtype, il.shape)

    prev_pts, prev_lns = extract_one(jnp.asarray(seq.images_l[0]),
                                     jnp.asarray(seq.images_r[0]), cam, cfg)
    T0 = jnp.eye(4)

    f_full = partial(vo_chunk, cam=cam, cfg=cfg)
    t_full = bench_fn(lambda: f_full(il, ir, prev_pts, prev_lns, T0))
    print(f"vo_chunk total      : {t_full*1e3/chunk:7.3f} ms/frame")

    def to_f32(x):
        return x.astype(jnp.float32) * (1/255.) if x.dtype == jnp.uint8 else x

    @jax.jit
    def ext_pts(a, b):
        a, b = to_f32(a), to_f32(b)
        return jax.vmap(lambda x, y: extract_stereo_points(x, y, cam, cfg))(a, b)

    @jax.jit
    def ext_lns(a, b):
        a, b = to_f32(a), to_f32(b)
        both = jnp.concatenate([a, b])
        return jax.vmap(lambda x: detect_and_describe_lines(x, cfg))(both)

    @jax.jit
    def det_pts(a, b):
        a, b = to_f32(a), to_f32(b)
        both = jnp.concatenate([a, b])
        return jax.vmap(lambda x: detect_and_describe(x, cfg))(both)

    @jax.jit
    def fast_only(a, b):
        a, b = to_f32(a), to_f32(b)
        both = jnp.concatenate([a, b])
        pcfg = cfg.points
        return jax.vmap(lambda x: fast_ops.detect_fast(
            x, pcfg.max_kpts, pcfg.fast_th, pcfg.fast_min_th,
            pcfg.adaptative_fast, pcfg.nms_radius, pcfg.grid_rows,
            pcfg.grid_cols))(both)

    @jax.jit
    def ext_both(a, b):
        a, b = to_f32(a), to_f32(b)
        return jax.vmap(lambda x, y: extract_stereo_frame(x, y, cam, cfg))(a, b)

    from plslam_tpu.ops import lines as lines_ops
    from plslam_tpu.ops import lbd as lbd_ops
    from plslam_tpu.ops.image import sobel_gradients, resize_bilinear

    lcfg = cfg.lines
    H, W = cfg.camera.height, cfg.camera.width
    diag = (H * H + W * W) ** 0.5

    @jax.jit
    def det_lines(a, b):
        a, b = to_f32(a), to_f32(b)
        both = jnp.concatenate([a, b])
        return jax.vmap(lambda x: lines_ops.detect_segments(
            x, max_lines=lcfg.max_lines, tile=lcfg.tile,
            grad_th=lcfg.grad_th / 255.0,
            merge_iters=max(lcfg.merge_iters * 3, 8),
            merge_ang_th=lcfg.merge_ang_th, merge_dist_th=lcfg.merge_dist_th,
            min_length=lcfg.min_line_length * diag))(both)

    segs2 = det_lines(il, ir)

    @jax.jit
    def desc_lines(a, b, segs):
        a, b = to_f32(a), to_f32(b)
        both = jnp.concatenate([a, b])

        def one(x, sp, ep):
            small = resize_bilinear(x, (x.shape[0] // 2, x.shape[1] // 2))
            gx, gy = sobel_gradients(small)
            return lbd_ops.describe_lines(
                small, sp * 0.5, ep * 0.5, n_bands=lcfg.lbd_bands,
                band_width=max(lcfg.lbd_band_width // 2, 3),
                n_samples=lcfg.lbd_samples,
                samples_per_band=lcfg.lbd_band_samples, gx=gx, gy=gy)
        return jax.vmap(one)(both, segs.sp, segs.ep)

    t_dl = bench_fn(lambda: det_lines(il, ir))
    t_db = bench_fn(lambda: desc_lines(il, ir, segs2))
    print(f"  line detect (L+R) : {t_dl*1e3/chunk:7.3f} ms/frame")
    print(f"  line LBD    (L+R) : {t_db*1e3/chunk:7.3f} ms/frame")

    t_p = bench_fn(lambda: ext_pts(il, ir))
    t_l = bench_fn(lambda: ext_lns(il, ir))
    t_b = bench_fn(lambda: ext_both(il, ir))
    t_d = bench_fn(lambda: det_pts(il, ir))
    t_f = bench_fn(lambda: fast_only(il, ir))
    print(f"extract points      : {t_p*1e3/chunk:7.3f} ms/frame")
    print(f"  detect+desc (L+R) : {t_d*1e3/chunk:7.3f} ms/frame")
    print(f"  fast only  (L+R)  : {t_f*1e3/chunk:7.3f} ms/frame")
    print(f"extract lines (L+R) : {t_l*1e3/chunk:7.3f} ms/frame")
    print(f"extract both        : {t_b*1e3/chunk:7.3f} ms/frame")
    print(f"tracking scan (est) : {(t_full-t_b)*1e3/chunk:7.3f} ms/frame")


if __name__ == "__main__":
    main()
