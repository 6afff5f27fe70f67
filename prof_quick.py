import os, time
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend.slam_system import ChunkedPLSLAM

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    n = 201
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l)); ir = u8(np.asarray(seq.images_r))

    for chunk in (20, 20, 40, 40, 20):
        slam = ChunkedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        t0 = time.perf_counter()
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        est = slam.finish()
        dt = time.perf_counter() - t0
        print(f"chunk={chunk}: {dt:6.2f}s ({(n-1)/dt:5.1f} fps) "
              f"kfs={slam._kf_slot+1} loops={slam.loop_closer.n_loops_closed}",
              flush=True)

main()
