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
    from plslam_tpu.tracking import batch_vo as BV

    T = {}
    def wrap(cls, name, key=None):
        key = key or name
        orig = getattr(cls, name)
        def timed(self, *a, **k):
            t0 = time.perf_counter()
            out = orig(self, *a, **k)
            T.setdefault(key, []).append(time.perf_counter() - t0)
            return out
        setattr(cls, name, timed)
    wrap(MH.MapHandler, "_flush_probes")
    wrap(MH.MapHandler, "_dispatch_batch")
    wrap(MH.MapHandler, "wait_dispatched")
    wrap(BV.BatchedStereoVO, "submit_chunk")
    from plslam_tpu.backend import slam_system as SS
    wrap(SS.ChunkedPLSLAM, "_settle_one")

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    n, chunk = 201, 20
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l)); ir = u8(np.asarray(seq.images_r))
    for rep in range(2):
        for k in T: T[k] = []
        slam = ChunkedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        t0 = time.perf_counter()
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        t1 = time.perf_counter()
        est = slam.finish()
        t2 = time.perf_counter()
        if rep:
            print(f"track={t1-t0:.2f}s finish={t2-t1:.2f}s "
                  f"loops={slam.loop_closer.n_loops_closed}")
            for k, v in T.items():
                per = " ".join(f"{x*1e3:.0f}" for x in v)
                print(f"  {k:16s}: n={len(v):2d} sum={sum(v)*1e3:7.0f}ms [{per}]")

main()
