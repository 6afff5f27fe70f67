#!/usr/bin/env python
"""Device-time profile of the pose-graph solvers (dense LU vs
matrix-free block-Jacobi PCG) at reference-scale keyframe counts.

Run on the TPU chip (default backend). Produces the numbers quoted in
BASELINE.md's loop-event cost section (round-4 verdict item 2: loop
closure at >=512 live KFs must stay <= ~100 ms).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.core import lie
from plslam_tpu.loop.pose_graph import (PoseGraph, optimize_pose_graph,
                                        optimize_pose_graph_pcg)


def build_graph(F, n_kfs, n_covis, seed=0):
    rng = np.random.default_rng(seed)
    gt = [np.eye(4, dtype=np.float32)]
    steps = []
    for k in range(n_kfs - 1):
        th = 2.0 * np.pi / (n_kfs - 1)
        step = np.asarray(lie.exp_se3(jnp.asarray(
            [0.12, 0.0, 0.01, 0.0, th, 0.0], jnp.float32)))
        steps.append(step)
        gt.append((gt[-1] @ step).astype(np.float32))
    noisy = [np.eye(4, dtype=np.float32)]
    for step in steps:
        xi = rng.normal(0, 0.004, 6).astype(np.float32)
        xi[3:] *= 0.3
        noisy.append((noisy[-1] @ step
                      @ np.asarray(lie.exp_se3(jnp.asarray(xi)))
                      ).astype(np.float32))
    edges = [(k, k + 1, steps[k], 1.0) for k in range(n_kfs - 1)]
    edges.append((0, n_kfs - 1,
                  (np.linalg.inv(gt[0]) @ gt[-1]).astype(np.float32), 2.0))
    for _ in range(n_covis):
        i = int(rng.integers(0, n_kfs - 10))
        j = i + int(rng.integers(2, 8))
        edges.append((i, j,
                      (np.linalg.inv(gt[i]) @ gt[j]).astype(np.float32),
                      1.0))
    E = 4 * F
    ei = np.zeros((E,), np.int32)
    ej = np.zeros((E,), np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ew = np.zeros((E,), np.float32)
    for n, (i, j, T, w) in enumerate(edges[:E]):
        ei[n], ej[n], eT[n], ew[n] = i, j, T, w
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:n_kfs] = np.stack(noisy)
    valid = np.zeros((F,), bool)
    valid[:n_kfs] = True
    return PoseGraph(poses=jnp.asarray(poses),
                     pose_valid=jnp.asarray(valid),
                     edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                     edge_T=jnp.asarray(eT), edge_w=jnp.asarray(ew))


def timeit(fn, g, reps=5):
    out = fn(g)                     # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(g)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt, float(out[1]), float(out[2])


def main():
    print(f"devices: {jax.devices()}")
    for F, n_kfs in [(128, 120), (512, 500), (1024, 1000)]:
        g = build_graph(F, n_kfs, n_covis=2 * n_kfs // 10)
        row = [f"F={F:5d} kfs={n_kfs:4d}"]
        if F <= 512:
            dt, c0, c1 = timeit(lambda gg: optimize_pose_graph(
                gg, iters=12), g)
            row.append(f"dense {dt:8.1f} ms (c {c0:.3g}->{c1:.3g})")
        dt, c0, c1 = timeit(lambda gg: optimize_pose_graph_pcg(
            gg, iters=12, cg_iters=96), g)
        row.append(f"pcg {dt:8.1f} ms (c {c0:.3g}->{c1:.3g})")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
