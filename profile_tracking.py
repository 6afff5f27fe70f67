"""Phase attribution inside the batched tracking step (real TPU).

device_get-synced, rig-floor-subtracted (see profile_lines.py). Ad hoc.
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
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.core import robust
    from plslam_tpu.io import synthetic
    from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
    from plslam_tpu.tracking import pose_gn
    from plslam_tpu.tracking.frame_handler import (build_point_terms,
                                                   build_line_terms,
                                                   match_f2f_points,
                                                   match_f2f_lines)

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    B = 20
    seq = synthetic.make_sequence(cam, n_frames=B + 1, seed=0, n_points=500,
                                  n_lines=60, noise=0.003, step=0.25)
    il = jnp.asarray(np.stack(seq.images_l))
    ir = jnp.asarray(np.stack(seq.images_r))

    @jax.jit
    def extract_all(a, b):
        return jax.vmap(lambda x, y: extract_stereo_frame(x, y, cam, cfg))(a, b)

    pts_all, lns_all = extract_all(il, ir)
    prev_p = jax.tree_util.tree_map(lambda x: x[:-1], pts_all)
    cur_p = jax.tree_util.tree_map(lambda x: x[1:], pts_all)
    prev_l = jax.tree_util.tree_map(lambda x: x[:-1], lns_all)
    cur_l = jax.tree_util.tree_map(lambda x: x[1:], lns_all)
    Tp = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    def phase(upto, it=None, it_ref=None):
        c = cfg
        if it is not None:
            c = cfg.with_updates({"tracking": {"max_iters": it,
                                               "max_iters_ref": it_ref}})

        def one(pp, pl, cp, cl, T0):
            mp = match_f2f_points(pp, cp, T0, cam, c)
            if upto == 1:
                return mp.idx[:8].astype(jnp.float32)
            terms = build_point_terms(pp, cp, mp)
            ml = match_f2f_lines(pl, cl, T0, cam, c)
            ln_terms = build_line_terms(pl, cl, ml)
            if upto == 2:
                return ln_terms.le_obs[:4, 0] + terms.uv_obs[:4, 0]
            res = pose_gn.optimize_pose(T0, cam, terms, ln_terms, c)
            return res.T

        return jax.jit(lambda i: jax.vmap(one)(
            jax.tree_util.tree_map(lambda x: jnp.roll(x, i, axis=0), prev_p),
            prev_l, cur_p, cur_l, Tp))

    def bench(jf, iters=6):
        jax.device_get(jf(0))
        t0 = time.perf_counter()
        for i in range(iters):
            jax.device_get(jf(i % 3))
        return (time.perf_counter() - t0) / iters

    floor = bench(jax.jit(lambda i: jnp.roll(il, i, 0)[:2, :8, :8]))
    t1 = bench(phase(1))
    t2 = bench(phase(2))
    t3a = bench(phase(3, 1, 1))
    t3b = bench(phase(3, 8, 8))
    print(f"rig floor        : {floor*1e3:8.2f} ms/call")
    print(f"pt matching      : {t1*1e3:8.2f} (+{(t1-floor)*1e3:6.2f})")
    print(f"+ln match+terms  : {t2*1e3:8.2f} (+{(t2-t1)*1e3:6.2f})")
    print(f"+GN 1+1 iters    : {t3a*1e3:8.2f} (+{(t3a-t2)*1e3:6.2f})")
    print(f"+GN 8+8 iters    : {t3b*1e3:8.2f} (+{(t3b-t3a)*1e3:6.2f})")
    print(f"  per gn iter    : {(t3b-t3a)*1e3/14:6.2f} ms (14 extra iters)")
    print(f"tracking/frame   : {(t3b-floor)*1e3/B:6.3f} ms")


if __name__ == "__main__":
    main()
