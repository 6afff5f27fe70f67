"""Sparse (PCG) pose-graph solver: equivalence with the dense solve and
closure quality past the dense wall (>512 keyframes).

Reference parity: pl-slam delegates its essential-graph optimization to
g2o (``loopClosureOptimizationEssentialGraphG2O``); g2o exploits graph
sparsity in its linear solver. ``optimize_pose_graph_pcg`` is the
TPU-native equivalent (matrix-free block-Jacobi PCG, one-hot incidence
matmuls); ``optimize_pose_graph`` remains the small-graph exact path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.core import lie
from plslam_tpu.loop.pose_graph import (PoseGraph, edge_residuals,
                                        optimize_pose_graph,
                                        optimize_pose_graph_pcg)


def _drifted_loop_graph(F_slots, n_kfs, seed=0, drift=0.002,
                        n_covis=0):
    """Circle trajectory: exact relative measurements, initial poses
    integrated from odometry corrupted by a per-step drift bias."""
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
    for k, step in enumerate(steps):
        xi = rng.normal(0, drift, 6).astype(np.float32)
        xi[3:] *= 0.3
        pert = np.asarray(lie.exp_se3(jnp.asarray(xi)))
        noisy.append((noisy[-1] @ step @ pert).astype(np.float32))

    edges = []
    for k in range(n_kfs - 1):                       # odometry = gt steps
        edges.append((k, k + 1, steps[k], 1.0))
    # loop edge start -> end (gt relative: near identity on the circle)
    T_loop = (np.linalg.inv(gt[0]) @ gt[-1]).astype(np.float32)
    edges.append((0, n_kfs - 1, T_loop, 2.0))
    for _ in range(n_covis):                         # extra skip edges
        i = int(rng.integers(0, n_kfs - 10))
        j = i + int(rng.integers(2, 8))
        T = (np.linalg.inv(gt[i]) @ gt[j]).astype(np.float32)
        edges.append((i, j, T, 1.0))

    E = int(2 ** np.ceil(np.log2(len(edges) + 1)))
    ei = np.zeros((E,), np.int32)
    ej = np.zeros((E,), np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ew = np.zeros((E,), np.float32)
    for n, (i, j, T, w) in enumerate(edges):
        ei[n], ej[n], eT[n], ew[n] = i, j, T, w

    poses = np.tile(np.eye(4, dtype=np.float32), (F_slots, 1, 1))
    poses[:n_kfs] = np.stack(noisy)
    valid = np.zeros((F_slots,), bool)
    valid[:n_kfs] = True
    g = PoseGraph(poses=jnp.asarray(poses), pose_valid=jnp.asarray(valid),
                  edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                  edge_T=jnp.asarray(eT), edge_w=jnp.asarray(ew))
    return g, np.stack(gt)


def _end_error(poses, gt, n_kfs):
    """Translation error of the final KF after gauge alignment to KF 0."""
    P = np.asarray(poses)
    align = gt[0] @ np.linalg.inv(P[0])
    return float(np.linalg.norm((align @ P[n_kfs - 1])[:3, 3]
                                - gt[n_kfs - 1][:3, 3]))


def test_pcg_matches_dense_midsize():
    g, gt = _drifted_loop_graph(96, 90, seed=1, n_covis=12)
    dense, c0d, c1d = optimize_pose_graph(g, iters=10)
    pcg, c0p, c1p = optimize_pose_graph_pcg(g, iters=10, cg_iters=96)
    assert float(c0d) == pytest.approx(float(c0p), rel=1e-5)
    # both solvers must reach (near-)identical optima
    assert float(c1p) <= 1.05 * float(c1d) + 1e-6
    dt = np.linalg.norm(np.asarray(dense)[:90, :3, 3]
                        - np.asarray(pcg)[:90, :3, 3], axis=-1)
    assert float(dt.max()) < 5e-3, f"max pose divergence {dt.max():.4f} m"


@pytest.mark.parametrize("n_kfs", [600])
def test_pcg_closes_loop_past_dense_wall(n_kfs):
    """>512 live KFs (verdict round-4 item 2): the sparse solver must
    actually close the accumulated drift, not just run."""
    F = 1024
    g, gt = _drifted_loop_graph(F, n_kfs, seed=2, drift=0.004,
                                n_covis=40)
    e_before = _end_error(g.poses, gt, n_kfs)
    new_poses, c0, c1 = optimize_pose_graph_pcg(g, iters=12, cg_iters=96)
    e_after = _end_error(new_poses, gt, n_kfs)
    assert np.isfinite(float(c1))
    assert float(c1) < 0.02 * float(c0), (c0, c1)
    assert e_before > 0.3                      # the drift was real
    assert e_after < 0.12 * e_before, (e_before, e_after)
    # residual of the loop edge itself must be near zero
    r = np.asarray(edge_residuals(new_poses, g))
    loop_r = np.linalg.norm(r[n_kfs - 1])      # loop edge slot
    assert loop_r < 0.05


def test_pcg_respects_invalid_slots():
    g, gt = _drifted_loop_graph(128, 60, seed=3)
    new_poses, _, _ = optimize_pose_graph_pcg(g, iters=6, cg_iters=64)
    moved = np.abs(np.asarray(new_poses)[60:]
                   - np.asarray(g.poses)[60:]).max()
    assert moved < 1e-6, "PCG touched invalid pose slots"
