"""Front-end stage breakdown: synchronized wall of each sub-program.

Each stage is jitted standalone on a 20-frame chunk and timed with a
full device_get of a small reduction (the only honest clock here).
"""
import os
import time

import numpy as np


def sync_ms(fn, *args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            jax.device_get(leaf)
        ts.append((time.perf_counter() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
    from plslam_tpu.frontend.stereo_points import detect_and_describe
    from plslam_tpu.frontend.stereo_lines import detect_and_describe_lines
    from plslam_tpu.tracking.batch_vo import vo_chunk, extract_one

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    chunk = 20
    seq = synthetic.make_sequence(cam, n_frames=41, seed=0,
                                  n_points=500, n_lines=60,
                                  noise=0.003, step=0.25)
    il = jnp.asarray(np.asarray(seq.images_l))[1:1 + chunk]
    ir = jnp.asarray(np.asarray(seq.images_r))[1:1 + chunk]
    both = jnp.stack([il, ir])                      # (2, B, H, W)
    flat = both.reshape(2 * chunk, *both.shape[2:])  # (40, H, W)
    jax.block_until_ready(flat)

    r = lambda pts: jnp.sum(pts.uv)  # tiny fetch

    @jax.jit
    def full_extract(a, b):
        pts, lns = jax.vmap(
            lambda x, y: extract_stereo_frame(x, y, cam, cfg))(a, b)
        return jnp.sum(pts.uv) + (jnp.sum(lns.le) if lns is not None else 0.0)

    @jax.jit
    def points_detect(ims):
        out = jax.vmap(lambda im: detect_and_describe(im, cfg))(ims)
        return jnp.sum(out[0]) + jnp.sum(out[1].astype(jnp.float32))

    @jax.jit
    def lines_detect(ims):
        segs, d = jax.vmap(lambda im: detect_and_describe_lines(im, cfg))(ims)
        return jnp.sum(segs.sp) + jnp.sum(d)

    prev_pts, prev_lns = extract_one(il[0], ir[0], cam, cfg)
    T0 = jnp.eye(4, dtype=jnp.float32)

    def vo_full(a, b):
        out = vo_chunk(a, b, prev_pts, prev_lns, T0, cam, cfg)
        return out.DT

    print(f"vo_chunk (all)      : {sync_ms(vo_full, il, ir):7.1f} ms")
    print(f"extract 20x2 joint  : {sync_ms(full_extract, il, ir):7.1f} ms")
    print(f"points det+desc x40 : {sync_ms(points_detect, flat):7.1f} ms")
    print(f"lines  det+desc x40 : {sync_ms(lines_detect, flat):7.1f} ms")

    cfgs = {
        "nolines": cfg.with_updates({"lines": {"has_lines": False}}),
        "nopoints": cfg.with_updates({"points": {"has_points": False}}),
    }
    for name, c in cfgs.items():
        @jax.jit
        def fe(a, b, c=c):
            pts, lns = jax.vmap(
                lambda x, y: extract_stereo_frame(x, y, cam, c))(a, b)
            s = jnp.sum(pts.uv) if c.points.has_points else 0.0
            if lns is not None:
                s = s + jnp.sum(lns.le)
            return s
        print(f"extract {name:9s}  : {sync_ms(fe, il, ir):7.1f} ms")


if __name__ == "__main__":
    main()
