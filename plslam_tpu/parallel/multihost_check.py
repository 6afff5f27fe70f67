"""Multi-process distributed-LBA worker (SURVEY.md §7.1 step 8).

Run by tests/test_multihost.py as N real OS processes wired together
with ``jax.distributed`` over localhost — the exact bring-up a TPU pod
uses (one process per host, collectives across processes), executed on
the CPU backend so it is testable on this rig. Each process owns
``--local-devices`` virtual devices; the global mesh spans all
processes; the landmark-sharded Schur step runs across them.

Usage (each rank):
  python -m plslam_tpu.parallel.multihost_check \
      --rank R --nprocs N --port P --out DIR [--local-devices 2]

Writes rank 0's (dxi, d_pt, d_ep) to DIR/rank0.npz.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from plslam_tpu.parallel.mesh import init_multihost, make_global_mesh
    init_multihost(coordinator_address=f"localhost:{args.port}",
                   num_processes=args.nprocs, process_id=args.rank)
    assert jax.process_count() == args.nprocs

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from plslam_tpu.config import CameraConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.parallel.dist_lba import (_problem_specs,
                                              bucket_problem_by_owner,
                                              make_dist_lba_step,
                                              unbucket_landmarks)

    cam = StereoCamera.from_config(CameraConfig(
        width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        baseline=0.4))
    mesh = make_global_mesh(axes=("lm",))
    n_dev = mesh.devices.size
    # deterministic: every rank buckets the same problem identically
    b = jax.tree_util.tree_map(
        np.asarray, bucket_problem_by_owner(make_problem(), n_dev))
    spec = _problem_specs(None, "lm")

    def to_global(x_np, s):
        shard = NamedSharding(mesh, s)
        return jax.make_array_from_callback(
            x_np.shape, shard, lambda idx: np.ascontiguousarray(x_np[idx]))

    prob = jax.tree_util.tree_map(to_global, b.problem, spec)
    step = make_dist_lba_step(mesh, cam)
    dxi, d_pt, d_ep = step(prob, jnp.asarray(1e-3))
    # landmark updates come back sharded; gather + unpermute for the check
    from jax.experimental import multihost_utils
    d_pt_g = multihost_utils.process_allgather(d_pt, tiled=True)
    d_ep_g = multihost_utils.process_allgather(d_ep, tiled=True)
    out = (np.asarray(jax.device_get(dxi)),
           np.asarray(unbucket_landmarks(jnp.asarray(d_pt_g),
                                         jnp.asarray(b.pt_perm))),
           np.asarray(unbucket_landmarks(jnp.asarray(d_ep_g),
                                         jnp.asarray(b.ep_perm))))
    if args.rank == 0:
        np.savez(os.path.join(args.out, "rank0.npz"),
                 dxi=out[0], d_pt=out[1], d_ep=out[2],
                 n_devices=np.asarray(n_dev))
    # all ranks must reach here for a clean shutdown
    jax.experimental.multihost_utils.sync_global_devices("done")


def make_problem(W: int = 4, Pn: int = 64, Q: int = 32, seed: int = 7):
    """Deterministic GEOMETRICALLY CONSISTENT small LBA problem
    (identical on every rank): real projections + small noise, so the
    normal equations are well-conditioned and cross-process reduction
    order only perturbs the step at f32 noise level."""
    import numpy as np
    from plslam_tpu.backend import lba
    rng = np.random.default_rng(seed)
    f32 = np.float32
    fx = fy = 500.0
    cx, cy, b = 320.0, 240.0, 0.4
    pt = np.stack([rng.uniform(-6, 6, Pn), rng.uniform(-4, 4, Pn),
                   rng.uniform(8, 25, Pn)], -1).astype(f32)
    ep = np.stack([rng.uniform(-6, 6, Q), rng.uniform(-4, 4, Q),
                   rng.uniform(8, 25, Q)], -1).astype(f32)
    pose = np.tile(np.eye(4, dtype=f32), (W, 1, 1))
    pose[:, 2, 3] = (0.3 * np.arange(W)).astype(f32)   # forward motion

    def proj(T, X):
        Xc = X @ T[:3, :3].T + T[:3, 3]
        return np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                         fy * Xc[:, 1] / Xc[:, 2] + cy], -1), Xc[:, 2]

    obs_uv = np.zeros((W, Pn, 2), f32)
    obs_disp = np.zeros((W, Pn), f32)
    for w in range(W):
        uv, z = proj(pose[w], pt)
        obs_uv[w] = uv + rng.normal(0, 0.3, uv.shape)
        obs_disp[w] = fx * b / z + rng.normal(0, 0.3, z.shape)
    obs_id = np.broadcast_to(np.arange(Pn, dtype=np.int32), (W, Pn)).copy()
    obs_id[rng.uniform(size=(W, Pn)) < 0.15] = -1

    L = Q // 2
    sid = np.broadcast_to(np.arange(0, Q, 2, dtype=np.int32), (W, L)).copy()
    eid = sid + 1
    le = np.zeros((W, L, 3), f32)
    for w in range(W):
        sp, _ = proj(pose[w], ep[0::2])
        epx, _ = proj(pose[w], ep[1::2])
        sp = sp + rng.normal(0, 0.3, sp.shape)
        epx = epx + rng.normal(0, 0.3, epx.shape)
        h = np.cross(np.concatenate([sp, np.ones((L, 1))], -1),
                     np.concatenate([epx, np.ones((L, 1))], -1))
        le[w] = (h / np.maximum(np.linalg.norm(h[:, :2], axis=-1,
                                               keepdims=True), 1e-9)
                 ).astype(f32)

    # perturb the state so the step is non-trivial
    pt_noisy = pt + rng.normal(0, 0.05, pt.shape).astype(f32)
    ep_noisy = ep + rng.normal(0, 0.05, ep.shape).astype(f32)
    return lba.LBAProblem(
        kf_pose=pose,
        kf_fixed=np.eye(1, W, 0, dtype=bool)[0],
        kf_valid=np.ones((W,), bool),
        pt_pos=pt_noisy, ep_pos=ep_noisy,
        obs_pt_uv=obs_uv, obs_pt_disp=obs_disp, obs_pt_id=obs_id,
        obs_ln_le=le, obs_ln_sid=sid, obs_ln_eid=eid)


if __name__ == "__main__":
    import jax.experimental.multihost_utils  # noqa: F401  (used above)
    main()
