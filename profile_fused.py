"""Wall-clock phase breakdown of the FUSED full-SLAM driver (real TPU).

Per chunk: submit (jnp.asarray image push + one fused dispatch) vs
settle (the single packed-buffer fetch + host loop logic). Host wall
timestamps around device_get are the only trustworthy signal on this
rig. Not part of the test suite.
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
    from plslam_tpu.backend.fused_slam import FusedPLSLAM

    cfg = SlamConfig()
    upd = {}
    if os.environ.get("PF_NO_LOOPS"):
        upd = {"loop": {"enabled": False}}
    if os.environ.get("PF_KF_BATCH"):
        upd.setdefault("system", {})["kf_batch"] = int(os.environ["PF_KF_BATCH"])
    if os.environ.get("PF_LBA_ITERS"):
        upd.setdefault("mapping", {})["lba_iters"] = int(os.environ["PF_LBA_ITERS"])
    if upd:
        cfg = cfg.with_updates(upd)
    block = bool(os.environ.get("PF_BLOCK"))   # time device program per chunk
    cam = StereoCamera.from_config(cfg.camera)
    chunk, n = 20, 201
    seq = synthetic.make_sequence(cam, n_frames=n, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = u8(np.asarray(seq.images_l))
    ir = u8(np.asarray(seq.images_r))

    def run(report):
        t_submit, t_settle, t_block = [], [], []
        t_upw, t_disp = [], []
        slam = FusedPLSLAM(cfg, cam)
        slam.initialize(il[0], ir[0])
        t_start = time.perf_counter()
        for lo in range(1, n, chunk):
            t0 = time.perf_counter()
            # inline process_chunk with phase timers
            from plslam_tpu.backend.fused_slam import _PendingUpload
            slam._upload_q.append(_PendingUpload(
                slam._pool.submit(slam._upload, il[lo:lo + chunk],
                                  ir[lo:lo + chunk]), None))
            tA = time.perf_counter()
            if len(slam._upload_q) >= 2:
                up = slam._upload_q.pop(0)
                imgs = up.fut.result()
                tB = time.perf_counter()
                slam._dispatch(imgs, up.n_valid)
                tC = time.perf_counter()
                t_upw.append(tB - tA)
                t_disp.append(tC - tB)
            t1 = time.perf_counter()
            if block:    # unpipelined: true device wall time per program
                import jax
                if slam._pending:
                    jax.block_until_ready(slam._pending[-1].host_ref)
                t1b = time.perf_counter()
                t_block.append(t1b - t1)
            if len(slam._pending) >= 2:
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
            if t_upw:
                print(f"upload-wait: {sum(t_upw)*1e3:8.1f} ms "
                      f"(per chunk: {[f'{t*1e3:.0f}' for t in t_upw]})")
                print(f"dispatch   : {sum(t_disp)*1e3:8.1f} ms "
                      f"(per chunk: {[f'{t*1e3:.0f}' for t in t_disp]})")
            if t_block:
                print(f"block sum  : {sum(t_block)*1e3:8.1f} ms "
                      f"(per chunk: {[f'{t*1e3:.0f}' for t in t_block]})")
            print(f"kfs={slam._kf_slot+1} loops="
                  f"{slam.loop_closer.n_loops_closed if slam.loop_closer else 0}")

    run(False)   # compile
    for _ in range(3):
        run(True)
        print("---")


if __name__ == "__main__":
    main()
