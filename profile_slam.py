"""Wall-clock phase breakdown of the chunked full-SLAM loop (real TPU).

Times, per 20-frame chunk: submit (includes host->device image push),
settle (fetch DT/cov + KF decisions + KF slicing + mapping hand-off),
and the mapping worker's own phases. Host wall timestamps around
device_get are the only trustworthy signal on this rig (see
axon-rig-measurement memory). Not part of the test suite.
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
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend.slam_system import ChunkedPLSLAM
    from plslam_tpu.backend import map_handler

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 20, 201
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l))
    ir = u8(np.asarray(seq.images_r))

    # wrap the worker-side _process to time the mapping program dispatch
    proc_times = []
    orig_process = map_handler.MapHandler._process
    def timed_process(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_process(self, *a, **k)
        proc_times.append(time.perf_counter() - t0)
        return out
    map_handler.MapHandler._process = timed_process

    def run(report):
        t_submit, t_settle = [], []
        proc_times.clear()
        slam = ChunkedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        t_start = time.perf_counter()
        for lo in range(1, n, chunk):
            t0 = time.perf_counter()
            slam.vo.submit_chunk(il[lo:lo + chunk], ir[lo:lo + chunk],
                                 keep_feats=True)
            slam._inflight.append(None)
            t1 = time.perf_counter()
            if len(slam._inflight) >= 2:
                slam._settle_one()
            t2 = time.perf_counter()
            t_submit.append(t1 - t0)
            t_settle.append(t2 - t1)
        t3 = time.perf_counter()
        est = slam.finish()
        t4 = time.perf_counter()
        if report:
            tot = t4 - t_start
            print(f"total      : {tot*1e3:8.1f} ms "
                  f"({(n-1)/tot:.1f} fps all-in)")
            print(f"submit sum : {sum(t_submit)*1e3:8.1f} ms "
                  f"(per chunk: {[f'{t*1e3:.0f}' for t in t_submit]})")
            print(f"settle sum : {sum(t_settle)*1e3:8.1f} ms "
                  f"(per chunk: {[f'{t*1e3:.0f}' for t in t_settle]})")
            print(f"finish     : {(t4-t3)*1e3:8.1f} ms")
            print(f"mapping _process on worker: n={len(proc_times)} "
                  f"sum={sum(proc_times)*1e3:.1f} ms "
                  f"mean={np.mean(proc_times)*1e3:.1f} ms")
            print(f"kfs={slam._kf_slot+1} "
                  f"loops={slam.loop_closer.n_loops_closed}")

    run(report=False)   # compile pass
    run(report=True)
    run(report=True)


if __name__ == "__main__":
    main()
