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
    from plslam_tpu.backend import map_handler as MH

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    n, chunk = 201, 20
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l)); ir = u8(np.asarray(seq.images_r))

    def run(tag, loops, bp):
        orig = MH.MapHandler.backlog
        if not bp:
            MH.MapHandler.backlog = lambda self: 0
        try:
            slam = ChunkedPLSLAM(cfg, cam, enable_loops=loops)
            slam.initialize(il[0], ir[0])
            t0 = time.perf_counter()
            for lo in range(1, n, chunk):
                slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
            est = slam.finish()
            dt = time.perf_counter() - t0
            nl = slam.loop_closer.n_loops_closed if slam.loop_closer else 0
            print(f"{tag}: {dt:6.2f}s ({(n-1)/dt:5.1f} fps) loops={nl}",
                  flush=True)
        finally:
            MH.MapHandler.backlog = orig

    run("warm loops+bp   ", True, True)
    run("loops+bp        ", True, True)
    run("loops no-bp     ", True, False)
    run("no-loops bp     ", False, True)
    run("no-loops no-bp  ", False, False)
    run("loops+bp (again)", True, True)

main()
