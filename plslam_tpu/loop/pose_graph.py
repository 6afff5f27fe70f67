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


def edge_residuals(poses: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    """(E, 6) residuals log(Tm^-1 Ti^-1 Tj), zeroed for unused slots."""
    Ti = poses[g.edge_i]
    Tj = poses[g.edge_j]
    Tm_inv = jax.vmap(lie.inverse_se3)(g.edge_T)
    r = jax.vmap(lie.log_se3)(
        lie.mm(lie.mm(Tm_inv, jax.vmap(lie.inverse_se3)(Ti)), Tj))
    return jnp.where((g.edge_w > 0)[:, None], r, 0.0)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(g: PoseGraph, iters: int = 12,
                        fix_first: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (optimized poses (F,4,4), cost0, cost1)."""
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

        # pin invalid slots and (optionally) the first valid pose
        pin = (~g.pose_valid).astype(jnp.float32) * 1e6
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
