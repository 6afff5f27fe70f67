"""Kernel-level breakdown of the stereo extraction front-end (real TPU).

Times extract_stereo_frame vmapped over a 20-frame chunk (the fused
program's dominant stage at ~150 of ~216 ms) and prints the top
kernels, plus points-only and lines-only variants to attribute them.
Not part of the test suite.
"""
import os


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
    from plslam_tpu.utils.devtime import device_time_ms, kernel_breakdown_ms

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    seq = synthetic.make_sequence(cam, n_frames=20, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    il = jnp.asarray(np.asarray(seq.images_l), jnp.float32)
    ir = jnp.asarray(np.asarray(seq.images_r), jnp.float32)

    variants = {
        "points+lines": cfg,
        "points-only": cfg.with_updates({"lines": {"has_lines": False}}),
        "lines-only": cfg.with_updates({"points": {"has_points": False}}),
    }
    for name, c in variants.items():
        fn = jax.jit(jax.vmap(
            lambda a, b: extract_stereo_frame(a, b, cam, c)))
        ms = device_time_ms(lambda: fn(il, ir))
        print(f"extract 20f {name:13s}: {ms:8.2f} ms  "
              f"({ms / 20:.2f} ms/frame)")
    fn = jax.jit(jax.vmap(
        lambda a, b: extract_stereo_frame(a, b, cam, cfg)))
    print("top kernels (points+lines):")
    for kname, ms in kernel_breakdown_ms(lambda: fn(il, ir), top=25):
        print(f"  {ms:8.3f} ms  {kname}")


if __name__ == "__main__":
    main()
