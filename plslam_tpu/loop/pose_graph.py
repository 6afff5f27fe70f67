"""SE(3) pose-graph optimization (the g2o replacement).

Reference parity: pl-slam ``src/mapHandler.cpp ::
loopClosureOptimizationEssentialGraphG2O`` — after a verified loop, the
essential graph (odometry edges + covisibility edges + the loop edge)
is optimized over all KF poses. The reference delegates to g2o
(VertexSE3/EdgeSE3, SE(3) — stereo, so no Sim(3) scale); here it is a
batched Gauss-Newton: per-edge residual r = log(Tm^-1 Ti^-1 Tj) with
the standard small-residual Jacobians (right perturbation:
J_j = I, J_i = -Ad(Tm^-1)), 6x6 blocks scatter-added into a dense
(6F x 6F) normal system — dense linear algebra IS the TPU-idiomatic
sparse solver at these sizes (3072^2 fits trivially; the MXU eats the
factorization).

Fixed capacity: F pose slots, E edge slots, masked.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.core import lie

def _einsum_hi(*args, **kw):
    """einsum at full f32 precision (TPU default runs bf16 passes; too
    coarse for pose-graph / Schur normal equations — see core.lie.mm)."""
    kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)



class PoseGraph(NamedTuple):
    poses: jnp.ndarray        # (F, 4, 4) T_w_kf
    pose_valid: jnp.ndarray   # (F,)
    edge_i: jnp.ndarray       # (E,) int32
    edge_j: jnp.ndarray       # (E,)
    edge_T: jnp.ndarray       # (E, 4, 4) measured T_i^-1 T_j
    edge_w: jnp.ndarray       # (E,) weight (0 = unused slot)


def frozen_mask(g: PoseGraph) -> np.ndarray:
    """(F,) bool — poses NOT connected to the gauge component.

    A slot reachable (through used edges) from the first valid pose is
    constrained relative to the gauge; anything else — an edge-less
    orphan or a small component only connected internally (e.g. a
    loop-edge pair whose odometry neighbors were compacted away) — can
    translate freely WITHOUT changing the cost, so the solvers' accept
    guard cannot catch it drifting and the near-zero diagonal pin
    amplifies gradient noise into kilometre-scale excursions (observed
    in the round-5 endurance run: two KFs connected only to each other
    catapulted 433 km while every connected pose stayed sane). Both
    solvers freeze these slots at their current estimates — the
    correct answer for poses the graph carries no information about.

    Host-side union-find (numpy, E ~ thousands): runs once per solve
    on concrete inputs before tracing.
    """
    import numpy as _np
    valid = _np.asarray(g.pose_valid)
    F = valid.shape[0]
    parent = _np.arange(F)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    w = _np.asarray(g.edge_w)
    ei = _np.asarray(g.edge_i)
    ej = _np.asarray(g.edge_j)
    for i, j in zip(ei[w > 0], ej[w > 0]):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[ri] = rj
    if not valid.any():
        return ~valid
    root = find(int(_np.argmax(valid)))
    reach = _np.fromiter((find(s) == root for s in range(F)), bool, F)
    return valid & ~reach


def edge_residuals(poses: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    """(E, 6) residuals log(Tm^-1 Ti^-1 Tj), zeroed for unused slots."""
    Ti = poses[g.edge_i]
    Tj = poses[g.edge_j]
    Tm_inv = jax.vmap(lie.inverse_se3)(g.edge_T)
    r = jax.vmap(lie.log_se3)(
        lie.mm(lie.mm(Tm_inv, jax.vmap(lie.inverse_se3)(Ti)), Tj))
    return jnp.where((g.edge_w > 0)[:, None], r, 0.0)


def optimize_pose_graph(g: PoseGraph, iters: int = 12,
                        fix_first: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (optimized poses (F,4,4), cost0, cost1). Poses outside
    the gauge-connected component are frozen (see frozen_mask)."""
    return _optimize_dense(g, jnp.asarray(frozen_mask(g)), iters,
                           fix_first)


@partial(jax.jit, static_argnames=("iters", "fix_first"))
def _optimize_dense(g: PoseGraph, freeze: jnp.ndarray, iters: int = 12,
                    fix_first: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    F = g.poses.shape[0]

    def cost(poses):
        r = edge_residuals(poses, g)
        return jnp.sum(g.edge_w * jnp.sum(r * r, axis=-1))

    def gn_iter(_, carry):
        poses, c = carry
        r = edge_residuals(poses, g)                   # (E, 6)
        Tm_inv = jax.vmap(lie.inverse_se3)(g.edge_T)
        Ji = -jax.vmap(lie.adjoint_se3)(Tm_inv)        # (E, 6, 6)
        w = g.edge_w

        # normal equations: per-edge blocks into (F, F, 6, 6)
        Hii = _einsum_hi("e, e a p, e a q -> e p q", w, Ji, Ji)
        # J_j = I so Hjj = w I, Hij = w Ji^T
        H = jnp.zeros((F, F, 6, 6))
        eyes = jnp.broadcast_to(jnp.eye(6), Ji.shape)
        H = H.at[g.edge_i, g.edge_i].add(Hii)
        H = H.at[g.edge_j, g.edge_j].add(w[:, None, None] * eyes)
        Hij = _einsum_hi("e, e a p -> e p a", w, Ji)   # Ji^T * I
        H = H.at[g.edge_i, g.edge_j].add(Hij)
        H = H.at[g.edge_j, g.edge_i].add(jnp.swapaxes(Hij, -1, -2))
        gvec = jnp.zeros((F, 6))
        gvec = gvec.at[g.edge_i].add(
            _einsum_hi("e, e a p, e a -> e p", w, Ji, r))
        gvec = gvec.at[g.edge_j].add(w[:, None] * r)

        # pin invalid slots, gauge-disconnected slots, and (optionally)
        # the first valid pose
        pin = ((~g.pose_valid).astype(jnp.float32) * 1e6
               + freeze.astype(jnp.float32) * 1e8)
        if fix_first:
            first = jnp.argmax(g.pose_valid)
            pin = pin.at[first].add(1e8)
        idx = jnp.arange(F)
        H = H.at[idx, idx].add((pin[:, None, None] + 1e-5)
                               * jnp.eye(6) + 1e-6 * jnp.eye(6))

        Hm = H.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
        dx = -jnp.linalg.solve(Hm, gvec.reshape(-1)).reshape(F, 6)
        dx = jnp.where(g.pose_valid[:, None], dx, 0.0)
        # right-perturbation update T <- T exp(dx)
        new_poses = lie.mm(poses, jax.vmap(lie.exp_se3)(dx))
        c_new = cost(new_poses)
        ok = jnp.isfinite(c_new) & (c_new <= c)
        return (jnp.where(ok, new_poses, poses), jnp.where(ok, c_new, c))

    c0 = cost(g.poses)
    poses1, c1 = lax.fori_loop(0, iters, gn_iter, (g.poses, c0))
    return poses1, c0, c1


def optimize_pose_graph_pcg(g: PoseGraph, iters: int = 12,
                            cg_iters: int = 96, fix_first: bool = True
                            ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                       jnp.ndarray]:
    """PCG variant of optimize_pose_graph (see _optimize_pcg)."""
    return _optimize_pcg(g, jnp.asarray(frozen_mask(g)), iters,
                         cg_iters, fix_first)


@partial(jax.jit, static_argnames=("iters", "cg_iters", "fix_first"))
def _optimize_pcg(g: PoseGraph, freeze: jnp.ndarray, iters: int = 12,
                  cg_iters: int = 96, fix_first: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton with a MATRIX-FREE block-Jacobi-preconditioned CG
    linear solve — the sparse pose-graph solver (g2o ``SparseOptimizer``
    with PCG role) for graphs past the dense (6F)^2 wall.

    The normal matrix is never materialized: H x is applied edge-wise.
    With J_j = I and J_i = -Ad(Tm^-1) per edge (i, j, w),

        t_e   = Ji_e x_i + x_j
        (Hx)_i += w_e Ji_e^T t_e        (Hx)_j += w_e t_e

    Edge gathers/scatters run as ONE-HOT INCIDENCE MATMULS (P_i, P_j of
    shape (E, F)) — TPU-native: the native scatter/gather serializes
    per index, while (E, F) x (F, 6) contractions ride the MXU and the
    two incidence operators are built once per solve. The
    preconditioner is the exact block-diagonal of H (batched 6x6
    inverses). CG runs a fixed ``cg_iters`` schedule inside the
    program (data-dependent exit would force a while_loop with the same
    worst case); iterations past convergence are ~free at these sizes.

    Same contract as ``optimize_pose_graph``: (poses, cost0, cost1),
    monotone cost acceptance per GN step.
    """
    F = g.poses.shape[0]
    w = g.edge_w
    Pi = jax.nn.one_hot(g.edge_i, F, dtype=jnp.float32)      # (E, F)
    Pj = jax.nn.one_hot(g.edge_j, F, dtype=jnp.float32)
    # zero unused edge slots in the operators themselves so every
    # downstream contraction is automatically masked
    Pi = Pi * (w > 0)[:, None]
    Pj = Pj * (w > 0)[:, None]

    pin = ((~g.pose_valid).astype(jnp.float32) * 1e6
           + freeze.astype(jnp.float32) * 1e8)
    if fix_first:
        first = jnp.argmax(g.pose_valid)
        pin = pin.at[first].add(1e8)
    diag_scalar = pin + 1e-5 + 1e-6                          # (F,)

    def cost(poses):
        r = edge_residuals(poses, g)
        return jnp.sum(w * jnp.sum(r * r, axis=-1))

    def gn_iter(_, carry):
        poses, c = carry
        r = edge_residuals(poses, g)                         # (E, 6)
        Tm_inv = jax.vmap(lie.inverse_se3)(g.edge_T)
        Ji = -jax.vmap(lie.adjoint_se3)(Tm_inv)              # (E, 6, 6)

        # gradient: g_i += w Ji^T r, g_j += w r
        gi = _einsum_hi("e, e a p, e a -> e p", w, Ji, r)
        gvec = (_einsum_hi("e f, e p -> f p", Pi, gi)
                + _einsum_hi("e f, e p -> f p", Pj, w[:, None] * r))

        # exact block diagonal of H for the preconditioner
        Hii = _einsum_hi("e, e a p, e a q -> e p q", w, Ji, Ji)
        eye6 = jnp.eye(6)
        Hd = (_einsum_hi("e f, e p q -> f p q", Pi, Hii)
              + _einsum_hi("e f, e -> f", Pj, w)[:, None, None]
              * eye6
              + diag_scalar[:, None, None] * eye6)           # (F, 6, 6)
        Minv = jnp.linalg.inv(Hd)

        def applyH(x):                                        # (F, 6)
            xi = _einsum_hi("e f, f p -> e p", Pi, x)
            xj = _einsum_hi("e f, f p -> e p", Pj, x)
            t = _einsum_hi("e a p, e p -> e a", Ji, xi) + xj
            yi = _einsum_hi("e, e a p, e a -> e p", w, Ji, t)
            y = (_einsum_hi("e f, e p -> f p", Pi, yi)
                 + _einsum_hi("e f, e p -> f p", Pj, w[:, None] * t))
            return y + diag_scalar[:, None] * x

        prec = lambda v: _einsum_hi("f p q, f q -> f p", Minv, v)

        # PCG on H dx = -g
        b = -gvec
        b2 = jnp.sum(b * b)
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = prec(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step(_, s):
            x, rr, z, p, rz = s
            Hp = applyH(p)
            pHp = jnp.sum(p * Hp)
            # frozen once converged/degenerate: alpha = 0 leaves x fixed
            ok = (pHp > 1e-12) & (rz > 1e-12 * b2 + 1e-30)
            alpha = jnp.where(ok, rz / jnp.maximum(pHp, 1e-30), 0.0)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = prec(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(ok, rz_new / jnp.maximum(rz, 1e-30), 0.0)
            p = z + beta * p
            return (x, rr, z, p, rz_new)

        dx, *_ = lax.fori_loop(0, cg_iters, cg_step,
                               (x0, r0, z0, p0, rz0))
        dx = jnp.where(g.pose_valid[:, None], dx, 0.0)
        new_poses = lie.mm(poses, jax.vmap(lie.exp_se3)(dx))
        c_new = cost(new_poses)
        ok = jnp.isfinite(c_new) & (c_new <= c)
        return (jnp.where(ok, new_poses, poses), jnp.where(ok, c_new, c))

    c0 = cost(g.poses)
    poses1, c1 = lax.fori_loop(0, iters, gn_iter, (g.poses, c0))
    return poses1, c0, c1
