"""Phase attribution for the point front-end on the real TPU.

device_get-synced, rig-floor-subtracted, truncated-variant methodology
(see profile_lines.py). Ad hoc tool.
"""
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
    from plslam_tpu.frontend import stereo_points as SP
    from plslam_tpu.frontend.stereo_points import detect_and_describe
    from plslam_tpu.ops import fast as F
    from plslam_tpu.ops import image as I

    cfg = SlamConfig()
    p = cfg.points
    B, H, W = 40, 376, 1241
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))

    def phase_fn(img, upto):
        if upto == 0:
            return img[:8, :8]
        levels = I.build_pyramid(img, p.orb_nlevels, p.orb_scale_factor)
        if upto == 1:
            return sum(l[:8, :8] for l in levels)
        caps = SP._level_capacities(2 * p.max_kpts, p.orb_nlevels,
                                    p.orb_scale_factor)
        dets = []
        for lvl, cap in zip(levels, caps):
            uv, sc, val = F.detect_fast(
                lvl, cap, th=p.fast_th / 255.0, th_min=p.fast_min_th / 255.0,
                adaptive=p.adaptative_fast, nms_radius=p.nms_radius,
                grid_rows=p.grid_rows, grid_cols=p.grid_cols, border=16)
            dets.append((uv, sc, val))
        if upto == 2:
            return sum(d[0][:4, :] for d in dets)
        return None

    def bench(f, iters=6):
        jf = jax.jit(lambda x, i: jax.vmap(f)(jnp.roll(x, i, axis=0)))
        jax.device_get(jf(base, 0))
        t0 = time.perf_counter()
        for i in range(iters):
            jax.device_get(jf(base, i + 1))
        return (time.perf_counter() - t0) / iters

    t0 = bench(lambda im: phase_fn(im, 0))
    t1 = bench(lambda im: phase_fn(im, 1))
    t2 = bench(lambda im: phase_fn(im, 2))
    t3 = bench(lambda im: detect_and_describe(im, cfg)[0][:8])
    print(f"rig floor      : {t0*1e3:8.2f} ms/call")
    print(f"pyramid        : {t1*1e3:8.2f} (+{(t1-t0)*1e3:6.2f})")
    print(f"+FAST+topk     : {t2*1e3:8.2f} (+{(t2-t1)*1e3:6.2f})")
    print(f"full det+desc  : {t3*1e3:8.2f} (+{(t3-t2)*1e3:6.2f})"
          f"   [desc+orient cost]")
    print(f"per-frame full : {(t3-t0)*1e3/(B/2):6.3f} ms/frame (L+R)")

    # ---- stereo matching + tracking scan, same floor methodology --------
    import jax as _jax
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
    from plslam_tpu.tracking import pose_gn
    from plslam_tpu.tracking.frame_handler import (build_point_terms,
                                                   build_line_terms,
                                                   match_f2f_points,
                                                   match_f2f_lines)
    cam = StereoCamera.from_config(cfg.camera)
    nF = B // 2
    il, ir = base[:nF], base[nF:]

    def bench2(jf, iters=6):
        _jax.device_get(jf(il, ir, 0))
        t0 = time.perf_counter()
        for i in range(iters):
            _jax.device_get(jf(il, ir, i + 1))
        return (time.perf_counter() - t0) / iters

    @_jax.jit
    def full_extract(a, b, i):
        a = jnp.roll(a, i, axis=0)
        pts, lns = _jax.vmap(
            lambda x, y: extract_stereo_frame(x, y, cam, cfg))(a, b)
        return pts.uv[:, :4], (lns.sp[:, :4] if lns is not None else 0)

    @_jax.jit
    def pts_only_extract(a, b, i):
        from plslam_tpu.frontend.stereo_points import extract_stereo_points
        a = jnp.roll(a, i, axis=0)
        pts = _jax.vmap(
            lambda x, y: extract_stereo_points(x, y, cam, cfg))(a, b)
        return pts.uv[:, :4]

    t_ext_p = bench2(pts_only_extract)
    t_ext = bench2(full_extract)
    print(f"extract pts+stereo   : {t_ext_p*1e3:8.2f} "
          f"[{(t_ext_p-t0)*1e3/nF:6.3f} ms/frame]")
    print(f"extract full (p+l)   : {t_ext*1e3:8.2f} "
          f"[{(t_ext-t0)*1e3/nF:6.3f} ms/frame]")

    # tracking scan on fixed features
    from plslam_tpu.tracking.batch_vo import vo_chunk, extract_one
    prev = extract_one(il[0], ir[0], cam, cfg)

    @_jax.jit
    def chunk_full(a, b, i):
        a = jnp.roll(a, i, axis=0)
        out = vo_chunk(a, b, prev[0], prev[1], jnp.eye(4), cam, cfg)
        return out.DT

    t_chunk = bench2(chunk_full)
    print(f"vo_chunk total       : {t_chunk*1e3:8.2f} "
          f"[{(t_chunk-t0)*1e3/nF:6.3f} ms/frame]")
    print(f"  -> tracking scan   : [{(t_chunk-t_ext)*1e3/nF:6.3f} ms/frame]")


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
