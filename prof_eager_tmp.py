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

    stats = {"eager": 0, "pipe": 0, "flushes": 0, "flush_sizes": [],
             "votes": 0, "cands": 0}
    orig_dispatch = MH.MapHandler._dispatch_batch
    def wrap_dispatch(self, *a, **k):
        if k.get("handler"): stats["eager"] += 1
        else: stats["pipe"] += 1
        return orig_dispatch(self, *a, **k)
    MH.MapHandler._dispatch_batch = wrap_dispatch
    orig_flush = MH.MapHandler._flush_probes
    def wrap_flush(self, pending):
        if pending:
            stats["flushes"] += 1
            stats["flush_sizes"].append(len(pending))
        return orig_flush(self, pending)
    MH.MapHandler._flush_probes = wrap_flush
    orig_vote = LC.ConsistencyVoter.vote
    def wrap_vote(self, cands):
        stats["votes"] += 1
        stats["cands"] += len(cands)
        return orig_vote(self, cands)
    LC.ConsistencyVoter.vote = wrap_vote

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    n, chunk = 201, 20
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l)); ir = u8(np.asarray(seq.images_r))
    for rep in range(2):
        for k in stats: stats[k] = [] if k == "flush_sizes" else 0
        slam = ChunkedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        t0 = time.perf_counter()
        for lo in range(1, n, chunk):
            slam.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
        est = slam.finish()
        dt = time.perf_counter() - t0
        print(f"run {rep}: {dt:.2f}s ({(n-1)/dt:.1f} fps) "
              f"loops={slam.loop_closer.n_loops_closed} stats={stats}",
              flush=True)

main()
