"""Back-end benchmark: windowed local-bundle-adjustment LM iterations/sec
on one TPU chip (BASELINE.json metric 'BA iters/sec'), plus an optional
distributed-LBA check on the simulated CPU mesh.

  python bench_lba.py          # single-chip BA iters/sec (real TPU)
  python bench_lba.py dist     # CPU-mesh dist-LBA device-count sweep
                               # (correctness/overhead indicator only:
                               #  host-simulated devices share one CPU,
                               #  so this measures collective overhead,
                               #  NOT ICI scaling)

Problem shape mirrors the production mapping window: 10 KFs x 1024
point observations + 128 line observations per KF, 4096 point landmarks,
512 line landmarks.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_problem(jnp, lie, cam, W=10, P=4096, Q=1024, K=1024, L=128,
                 seed=0):
    from plslam_tpu.backend.lba import LBAProblem
    from plslam_tpu.frontend.features import line_equation
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-8, 8, P), rng.uniform(-4, 4, P),
                    rng.uniform(6, 30, P)], -1).astype(np.float32)
    eps = np.stack([rng.uniform(-8, 8, Q), rng.uniform(-4, 4, Q),
                    rng.uniform(6, 30, Q)], -1).astype(np.float32)
    poses, obs_uv, obs_disp, obs_id = [], [], [], []
    obs_le, obs_sid, obs_eid = [], [], []
    for w in range(W):
        xi = np.array([0.05 * w, 0.01 * w, -0.25 * w, 0.0, 0.01 * w, 0.0],
                      np.float32)
        T = np.asarray(lie.exp_se3(jnp.asarray(xi)))
        poses.append(T)
        sel = rng.choice(P, K, replace=False)
        Pc = pts[sel] @ T[:3, :3].T + T[:3, 3]
        uv = np.stack([cam.fx * Pc[:, 0] / Pc[:, 2] + cam.cx,
                       cam.fy * Pc[:, 1] / Pc[:, 2] + cam.cy], -1)
        obs_uv.append(uv + rng.normal(0, 0.3, uv.shape))
        obs_disp.append(cam.fx * cam.b / Pc[:, 2]
                        + rng.normal(0, 0.3, K))
        obs_id.append(sel)
        lsel = rng.choice(Q // 2, L, replace=False) * 2
        sPc = eps[lsel] @ T[:3, :3].T + T[:3, 3]
        ePc = eps[lsel + 1] @ T[:3, :3].T + T[:3, 3]
        sp = np.stack([cam.fx * sPc[:, 0] / sPc[:, 2] + cam.cx,
                       cam.fy * sPc[:, 1] / sPc[:, 2] + cam.cy], -1)
        ep = np.stack([cam.fx * ePc[:, 0] / ePc[:, 2] + cam.cx,
                       cam.fy * ePc[:, 1] / ePc[:, 2] + cam.cy], -1)
        le = np.asarray(line_equation(
            jnp.asarray(sp + rng.normal(0, 0.3, sp.shape)),
            jnp.asarray(ep + rng.normal(0, 0.3, ep.shape))))
        obs_le.append(le)
        obs_sid.append(lsel)
        obs_eid.append(lsel + 1)

    # perturbed initial state (first KF fixed = gauge)
    pose0 = []
    for w, T in enumerate(poses):
        if w == 0:
            pose0.append(T)
        else:
            xi = rng.normal(0, 0.01, 6).astype(np.float32)
            pose0.append(np.asarray(lie.mm(lie.exp_se3(jnp.asarray(xi)),
                                           jnp.asarray(T))))
    return LBAProblem(
        kf_pose=jnp.asarray(np.stack(pose0)),
        kf_fixed=jnp.asarray([w == 0 for w in range(W)]),
        kf_valid=jnp.ones((W,), bool),
        pt_pos=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape)
                           .astype(np.float32)),
        ep_pos=jnp.asarray(eps + rng.normal(0, 0.05, eps.shape)
                           .astype(np.float32)),
        obs_pt_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_pt_disp=jnp.asarray(np.stack(obs_disp), jnp.float32),
        obs_pt_id=jnp.asarray(np.stack(obs_id), jnp.int32),
        obs_ln_le=jnp.asarray(np.stack(obs_le), jnp.float32),
        obs_ln_sid=jnp.asarray(np.stack(obs_sid), jnp.int32),
        obs_ln_eid=jnp.asarray(np.stack(obs_eid), jnp.int32))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    if mode == "dist":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if mode == "dist":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core import lie
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.backend import lba

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    prob = make_problem(jnp, lie, cam)

    if mode == "chip":
        iters = cfg.mapping.lba_iters
        run = jax.jit(lambda p: lba.run_lba(p, cam, cfg))
        res = run(prob)
        jax.device_get(res.cost1)
        reps = 10
        t0 = time.perf_counter()
        for r in range(reps):
            p = prob._replace(pt_pos=prob.pt_pos + 1e-6 * r)
            jax.device_get(run(p).cost1)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "metric": "lba_lm_iters_per_sec_chip", "value":
                round(iters / dt, 2), "unit": "iters/s",
            "window": "10 KF x (1024 pt + 128 ln) obs",
            "ms_per_window_solve": round(dt * 1e3, 2)}))
        return

    # dist: device-count sweep of the owner-sharded Schur step on the CPU
    # mesh (the map itself is sharded; per-step all-reduce volume is
    # independent of map size — see parallel/dist_lba.py)
    from plslam_tpu.parallel.mesh import make_mesh
    from plslam_tpu.parallel.dist_lba import (bucket_problem_by_owner,
                                              make_dist_lba_step)
    lam = jnp.asarray(cfg.mapping.lambda_init)
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev, axes=("lm",))
        step = make_dist_lba_step(mesh, cam)
        b = bucket_problem_by_owner(prob, n_dev)
        out = step(b.problem, lam)
        jax.device_get(out[0])
        reps = 5
        t0 = time.perf_counter()
        for r in range(reps):
            p = b.problem._replace(pt_pos=b.problem.pt_pos + 1e-6 * r)
            jax.device_get(step(p, lam)[0])
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"devices": n_dev,
                          "ms_per_step": round(dt * 1e3, 2),
                          "note": "host-simulated mesh: overhead check, "
                                  "not ICI scaling"}))


if __name__ == "__main__":
    main()
