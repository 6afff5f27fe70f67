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
    from plslam_tpu.loop import loop_closer as LC

    tm = {}
    def wrap(cls, name):
        orig = getattr(cls, name)
        def timed(self, *a, **k):
            t0 = time.perf_counter()
            out = orig(self, *a, **k)
            tm.setdefault(name, []).append(time.perf_counter() - t0)
            return out
        setattr(cls, name, timed)
    wrap(MH.MapHandler, "_process_batch")
    wrap(LC.LoopCloser, "on_probe_batch")
    wrap(LC.LoopCloser, "_close_loop")
    wrap(LC.LoopCloser, "_optimize_graph")

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 20, 201
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l)); ir = u8(np.asarray(seq.images_r))

    def run(report):
        for v in tm.values(): v.clear()
        slam = ChunkedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        t0 = time.perf_counter()
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        t1 = time.perf_counter()
        est = slam.finish()
        t2 = time.perf_counter()
        if report:
            print(f"track={t1-t0:.2f}s finish={t2-t1:.2f}s "
                  f"kfs={slam._kf_slot+1} loops={slam.loop_closer.n_loops_closed}")
            for k, v in tm.items():
                print(f"  {k:18s}: n={len(v):3d} sum={sum(v)*1e3:7.1f} ms "
                      f"mean={np.mean(v)*1e3:6.1f} max={max(v)*1e3:6.1f}")
    run(False)
    run(True)

main()
