"""Ad-hoc stage profiler for the per-KF mapping/back-end path (real TPU).

Times (device-side, profiler trace): the fused mapping_step, its pieces
(add_keyframe, run_window_lba, remove_redundant_kfs, cull_landmarks),
and the loop-closure probe — to direct the round-2 full-SLAM speed work.
Not part of the test suite.
"""
import os


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.backend import map as bmap
    from plslam_tpu.backend.map_handler import mapping_step, run_window_lba
    from plslam_tpu.tracking.batch_vo import extract_one
    from plslam_tpu.utils.devtime import device_time_ms, kernel_breakdown_ms

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    seq = synthetic.make_sequence(cam, n_frames=12, seed=0, kind="loop",
                                  n_points=400, n_lines=60, noise=0.004,
                                  step=0.15)

    # build a map with ~10 KFs so the LBA window is full
    state = bmap.init_map_state(cfg)
    feats = []
    for i in range(12):
        pts, lns = extract_one(jnp.asarray(seq.images_l[i]),
                               jnp.asarray(seq.images_r[i]), cam, cfg)
        feats.append((pts, lns))
        T = jnp.asarray(seq.poses[i], jnp.float32)
        state, _ = bmap.add_keyframe(state, pts, lns, T, cam, cfg)
    jax.block_until_ready(state)
    pts, lns = feats[-1]
    T = jnp.asarray(seq.poses[-1], jnp.float32)

    f_step = partial(mapping_step, cam=cam, cfg=cfg, run_lba_flag=True)
    f_add = partial(bmap.add_keyframe, cam=cam, cfg=cfg)
    f_lba = partial(run_window_lba, cam=cam, cfg=cfg)
    f_red = partial(bmap.remove_redundant_kfs, cfg=cfg)
    f_cull = partial(bmap.cull_landmarks, cfg=cfg)

    print(f"mapping_step (fused): "
          f"{device_time_ms(lambda: f_step(state, pts, lns, T)):8.2f} ms")
    print(f"  add_keyframe      : "
          f"{device_time_ms(lambda: f_add(state, pts, lns, T)):8.2f} ms")
    print(f"  run_window_lba    : "
          f"{device_time_ms(lambda: f_lba(state)):8.2f} ms")
    print(f"  remove_redundant  : "
          f"{device_time_ms(lambda: f_red(state)):8.2f} ms")
    print(f"  cull_landmarks    : "
          f"{device_time_ms(lambda: f_cull(state)):8.2f} ms")

    # loop probe
    from plslam_tpu.loop.loop_closer import LoopCloser, _make_kf_probe
    lc = LoopCloser(cfg, cam)
    probe = _make_kf_probe(lc.db.voc_p, lc.db.voc_l, cfg, True)
    slot = jnp.asarray(9)
    print(f"  loop probe        : "
          f"{device_time_ms(lambda: probe(state, lc.db.bows_p, lc.db.bows_l, slot)):8.2f} ms")

    print("\ntop kernels in mapping_step:")
    for name, ms in kernel_breakdown_ms(lambda: f_step(state, pts, lns, T),
                                        top=20):
        print(f"  {ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
