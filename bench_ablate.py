"""Ablation benchmark: same rig/methodology as bench.py, but measures a
configurable subset of the pipeline so stage costs can be attributed
reliably (block_until_ready on this remote runtime does not actually
synchronize; end-to-end fetched chunks are the only trustworthy clock).

Usage: python bench_ablate.py [full|nolines|nopoints|fld|track-only]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.tracking.batch_vo import BatchedStereoVO

    cfg = SlamConfig()
    if mode == "nolines":
        cfg = cfg.with_updates({"lines": {"has_lines": False}})
    elif mode == "nopoints":
        cfg = cfg.with_updates({"points": {"has_points": False}})
    elif mode == "fld":
        cfg = cfg.with_updates({"lines": {"use_fld_lines": True}})
    elif mode == "pass1":
        cfg = cfg.with_updates({"tracking": {"chunk_passes": 1}})
    elif mode == "scan":
        cfg = cfg.with_updates({"tracking": {"batched_chunks": False}})
    cam = StereoCamera.from_config(cfg.camera)

    chunk = int(os.environ.get("CHUNK", "20"))
    depth = int(os.environ.get("DEPTH", "2"))
    n_frames = 3 * chunk + 1
    seq = synthetic.make_sequence(cam, n_frames=n_frames, seed=0,
                                  n_points=500, n_lines=60, noise=0.003,
                                  step=0.25)
    il = jnp.asarray(np.asarray(seq.images_l))
    ir = jnp.asarray(np.asarray(seq.images_r))

    vo = BatchedStereoVO(cfg, cam)
    vo.initialize(il[0], ir[0])
    out = vo.process_chunk(il[1:1 + chunk], ir[1:1 + chunk])

    reps, chunks_per_rep = 4, 6
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for k in range(chunks_per_rep):
            lo = 1 + (k % 3) * chunk
            vo.submit_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
            if len(vo._pending) >= depth:
                vo._integrate(vo._pending[0], update_prior=False)
        vo.drain()
        best = min(best, time.perf_counter() - t0)
    fps = chunks_per_rep * chunk / best
    print(json.dumps({"mode": mode, "fps": round(fps, 2),
                      "ms_per_frame": round(1e3 / fps, 3)}))


if __name__ == "__main__":
    main()
