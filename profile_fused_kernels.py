"""Device-side kernel breakdown of the fused full-SLAM chunk program.

Runs the FusedPLSLAM driver for a few chunks to reach a steady state,
then re-invokes the fused step on the captured inputs under the
profiler trace and prints total device time + top kernels. Not part of
the test suite.
"""
import os
import time

import numpy as np


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
    from plslam_tpu.backend.fused_slam import FusedPLSLAM
    from plslam_tpu.utils.devtime import device_time_ms, kernel_breakdown_ms

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 20, 101
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l))
    ir = u8(np.asarray(seq.images_r))

    slam = FusedPLSLAM(cfg, cam)
    slam.initialize(il[0], ir[0])
    for lo in range(1, n - chunk, chunk):
        slam._submit(il[lo:lo + chunk], ir[lo:lo + chunk], None)
        slam._settle_one()

    # capture steady-state inputs for one more chunk
    lo = n - chunk
    imgs = jnp.asarray(np.stack([il[lo:lo + chunk], ir[lo:lo + chunk]]))
    bows_p = slam.loop_closer.db.bows_p
    bows_l = slam.loop_closer.db.bows_l
    args = (imgs, slam.prev_pts, slam.prev_lns, slam.DT_prev,
            slam._crit, slam.state, bows_p, bows_l)

    fn = lambda: slam._step(*args)
    # wall-clock per dispatch (captures tunnel dispatch overhead)
    out = fn(); jax.block_until_ready(out)
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    walls = sorted(w * 1e3 for w in walls)
    print(f"fused step wall (median/best): {walls[len(walls)//2]:.1f} / "
          f"{walls[0]:.1f} ms")

    # chained variant: outputs feed the next call's inputs + fresh numpy
    # images each call (exactly the driver's steady-state pattern)
    prev_pts, prev_lns, DT_prev, crit, state = (
        slam.prev_pts, slam.prev_lns, slam.DT_prev, slam._crit, slam.state)
    bp, bl = bows_p, bows_l
    walls = []
    for it in range(6):
        t0 = time.perf_counter()
        (host_blk, state, bp, bl, crit, prev_pts, prev_lns,
         DT_prev) = slam._step(
            jnp.asarray(np.stack([il[lo:lo + chunk], ir[lo:lo + chunk]])),
            prev_pts, prev_lns, DT_prev, crit, state, bp, bl)
        jax.block_until_ready(host_blk)
        walls.append(time.perf_counter() - t0)
    walls = sorted(w * 1e3 for w in walls)
    print(f"fused step CHAINED wall (median/best): "
          f"{walls[len(walls)//2]:.1f} / {walls[0]:.1f} ms")

    # bisect A: chained state, FIXED device images
    prev_pts, prev_lns, DT_prev, crit, state = (
        slam.prev_pts, slam.prev_lns, slam.DT_prev, slam._crit, slam.state)
    bp, bl = bows_p, bows_l
    walls = []
    for it in range(6):
        t0 = time.perf_counter()
        (host_blk, state, bp, bl, crit, prev_pts, prev_lns,
         DT_prev) = slam._step(imgs, prev_pts, prev_lns,
                               DT_prev, crit, state, bp, bl)
        jax.block_until_ready(host_blk)
        walls.append(time.perf_counter() - t0)
    walls = sorted(w * 1e3 for w in walls)
    print(f"chained-state fixed-images wall (median/best): "
          f"{walls[len(walls)//2]:.1f} / {walls[0]:.1f} ms")

    # bisect B: fixed state args, FRESH numpy images each call
    walls = []
    for it in range(6):
        t0 = time.perf_counter()
        out = slam._step(
            jnp.asarray(np.stack([il[lo:lo + chunk], ir[lo:lo + chunk]])),
            *args[1:])
        jax.block_until_ready(out[0])
        walls.append(time.perf_counter() - t0)
    walls = sorted(w * 1e3 for w in walls)
    print(f"fixed-state fresh-images wall (median/best): "
          f"{walls[len(walls)//2]:.1f} / {walls[0]:.1f} ms")

    # bisect C: fresh images via device_put, blocked BEFORE dispatch
    put_ms, disp_ms = [], []
    for it in range(6):
        t0 = time.perf_counter()
        d = jax.device_put(np.stack([il[lo:lo + chunk], ir[lo:lo + chunk]]))
        jax.block_until_ready(d)
        t1 = time.perf_counter()
        out = slam._step(d, *args[1:])
        jax.block_until_ready(out[0])
        t2 = time.perf_counter()
        put_ms.append((t1 - t0) * 1e3)
        disp_ms.append((t2 - t1) * 1e3)
    print(f"device_put-first: put median {sorted(put_ms)[3]:.1f} ms, "
          f"dispatch median {sorted(disp_ms)[3]:.1f} ms")
    print(f"fused step device time: {device_time_ms(fn):8.2f} ms")
    print("top kernels:")
    for name, ms in kernel_breakdown_ms(fn, top=30):
        print(f"  {ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
