"""Distributed local bundle adjustment over a TPU mesh.

NEW capability (no reference equivalent — SURVEY.md §2.3 P5/P6): the
reference is a single-process CPU system; its scaling story ends at two
std::threads. Here the LBA normal-equation assembly is sharded with
``shard_map`` over a device mesh and reduced with XLA collectives over
ICI:

  stage 1 (observation-sharded): each device assembles partial
      H_cc, g_c, H_pp, g_p, H_cp from its slice of the observation
      slots; ``psum`` over the 'lm' axis yields the global blocks.
  stage 2 (landmark-sharded): each device owns a contiguous landmark
      range, inverts its 3x3 H_pp blocks, computes its partial Schur
      correction sum_p B_p H_cp_p^T; ``psum`` gives the reduced camera
      system S (tiny, solved replicated).
  stage 3: back-substitution of landmark updates is embarrassingly
      parallel over the landmark shards.

  The 'kf' mesh axis runs independent LBA windows (map blocks /
  trajectory segments) data-parallel — the distributed-BA layout of
  BASELINE.json's north star.

Correctness contract: the step is invariant to the device count (1-dev
mesh == N-dev mesh up to f32 reduction order) — asserted in tests on a
CPU mesh. It intentionally differs from backend.lba in ONE place: the
robust scale uses the collective-friendly mean-|r| estimator
(sigma = 1.2533 * mean|r|) instead of the median-based MAD, which would
need a distributed selection; both are consistent scale estimators for
the same weight family.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from plslam_tpu.backend import lba as lba_mod
from plslam_tpu.core import lie, robust
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.parallel.mesh import make_mesh, shard_map_fn

def _einsum_hi(*args, **kw):
    """einsum at full f32 precision (TPU default runs bf16 passes; too
    coarse for pose-graph / Schur normal equations — see core.lie.mm)."""
    kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)



def _local_assemble(problem: lba_mod.LBAProblem, cam: StereoCamera,
                    axis: str):
    """Stage 1 on the local observation shard + psum to global blocks."""
    W = problem.kf_pose.shape[0]
    Pn = problem.pt_pos.shape[0]
    Q = problem.ep_pos.shape[0]

    r, Jc, Jp, ok = lba_mod._point_rj(problem.kf_pose, problem.pt_pos,
                                      problem.obs_pt_uv, problem.obs_pt_disp,
                                      problem.obs_pt_id, cam)
    rs, Jcs, Jps, oks = lba_mod._endpoint_rj(problem.kf_pose, problem.ep_pos,
                                             problem.obs_ln_le,
                                             problem.obs_ln_sid, cam)
    re, Jce, Jpe, oke = lba_mod._endpoint_rj(problem.kf_pose, problem.ep_pos,
                                             problem.obs_ln_le,
                                             problem.obs_ln_eid, cam)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)

    # robust scale needs GLOBAL statistics: median via distributed
    # histogram would be exact; a psum-mean absolute deviation is the
    # cheap equivalent used here (same scale family, fully collective)
    n_ok = jax.lax.psum(jnp.sum(ok) + jnp.sum(oks) + jnp.sum(oke), axis)
    s_abs = jax.lax.psum(jnp.sum(jnp.where(ok, rn, 0.0))
                         + jnp.sum(jnp.where(oks, jnp.abs(rs), 0.0))
                         + jnp.sum(jnp.where(oke, jnp.abs(re), 0.0)), axis)
    # mean |r| * 1.2533 estimates sigma for gaussian residuals
    sigma = jnp.maximum(1.2533 * s_abs / jnp.maximum(n_ok, 1), 1e-4)

    w = jnp.where(ok, robust.tstudent_weight(rn, sigma), 0.0)
    ws = jnp.where(oks, robust.tstudent_weight(jnp.abs(rs), sigma), 0.0)
    we = jnp.where(oke, robust.tstudent_weight(jnp.abs(re), sigma), 0.0)

    free = (~problem.kf_fixed) & problem.kf_valid
    Jc = jnp.where(free[:, None, None, None], Jc, 0.0)
    Jcs = jnp.where(free[:, None, None], Jcs, 0.0)
    Jce = jnp.where(free[:, None, None], Jce, 0.0)

    H_cc = (_einsum_hi("w k, w k i a, w k i b -> w a b", w, Jc, Jc)
            + _einsum_hi("w l, w l a, w l b -> w a b", ws, Jcs, Jcs)
            + _einsum_hi("w l, w l a, w l b -> w a b", we, Jce, Jce))
    g_c = (_einsum_hi("w k, w k i a, w k i -> w a", w, Jc, r)
           + _einsum_hi("w l, w l a, w l -> w a", ws, Jcs, rs)
           + _einsum_hi("w l, w l a, w l -> w a", we, Jce, re))

    pid = jnp.maximum(problem.obs_pt_id, 0)
    Hpp = jnp.zeros((Pn, 3, 3)).at[pid.reshape(-1)].add(
        _einsum_hi("w k, w k i a, w k i b -> w k a b", w, Jp, Jp
                   ).reshape(-1, 3, 3))
    g_p = jnp.zeros((Pn, 3)).at[pid.reshape(-1)].add(
        _einsum_hi("w k, w k i a, w k i -> w k a", w, Jp, r).reshape(-1, 3))
    w_rows = jnp.broadcast_to(jnp.arange(W)[:, None], pid.shape).reshape(-1)
    H_cp = jnp.zeros((W, Pn, 6, 3)).at[w_rows, pid.reshape(-1)].add(
        _einsum_hi("w k, w k i a, w k i b -> w k a b", w, Jc, Jp
                   ).reshape(-1, 6, 3))

    sid = jnp.maximum(problem.obs_ln_sid, 0)
    eid = jnp.maximum(problem.obs_ln_eid, 0)
    Hqq = jnp.zeros((Q, 3, 3))
    g_q = jnp.zeros((Q, 3))
    H_cq = jnp.zeros((W, Q, 6, 3))
    w_rows_l = jnp.broadcast_to(jnp.arange(W)[:, None], sid.shape).reshape(-1)
    for (ids_, ww, Jcx, Jpx, rx) in ((sid, ws, Jcs, Jps, rs),
                                     (eid, we, Jce, Jpe, re)):
        Hqq = Hqq.at[ids_.reshape(-1)].add(
            _einsum_hi("w l, w l a, w l b -> w l a b", ww, Jpx, Jpx
                       ).reshape(-1, 3, 3))
        g_q = g_q.at[ids_.reshape(-1)].add(
            _einsum_hi("w l, w l a, w l -> w l a", ww, Jpx, rx).reshape(-1, 3))
        H_cq = H_cq.at[w_rows_l, ids_.reshape(-1)].add(
            _einsum_hi("w l, w l a, w l b -> w l a b", ww, Jcx, Jpx
                       ).reshape(-1, 6, 3))

    # global blocks over the landmark/observation axis
    psum = lambda x: jax.lax.psum(x, axis)
    return (psum(H_cc), psum(g_c), psum(Hpp), psum(g_p), psum(H_cp),
            psum(Hqq), psum(g_q), psum(H_cq))


def _schur_solve_local(H_cc, g_c, Hpp, g_p, H_cp, Hqq, g_q, H_cq,
                       kf_free, lam, axis: str, n_dev: int):
    """Stages 2+3: landmark-sharded Schur reduction + replicated solve."""
    W = H_cc.shape[0]
    Pn = Hpp.shape[0]
    Q = Hqq.shape[0]
    me = jax.lax.axis_index(axis)
    p_chunk = Pn // n_dev
    q_chunk = Q // n_dev

    def shard_slice(x, chunk):
        return jax.lax.dynamic_slice_in_dim(x, me * chunk, chunk, axis=0)

    eye3 = jnp.eye(3)
    Hpp_s = shard_slice(Hpp, p_chunk)
    Hcp_s = jax.lax.dynamic_slice_in_dim(H_cp, me * p_chunk, p_chunk, axis=1)
    gp_s = shard_slice(g_p, p_chunk)
    Hpp_d = Hpp_s + (lam * jnp.maximum(
        jnp.diagonal(Hpp_s, axis1=-2, axis2=-1), 1e-3))[..., None] * eye3
    Hpp_inv = lie.inv3(Hpp_d)
    Bp = _einsum_hi("w p a b, p b c -> w p a c", Hcp_s, Hpp_inv)

    Hqq_s = shard_slice(Hqq, q_chunk)
    Hcq_s = jax.lax.dynamic_slice_in_dim(H_cq, me * q_chunk, q_chunk, axis=1)
    gq_s = shard_slice(g_q, q_chunk)
    Hqq_d = Hqq_s + (lam * jnp.maximum(
        jnp.diagonal(Hqq_s, axis1=-2, axis2=-1), 1e-3))[..., None] * eye3
    Hqq_inv = lie.inv3(Hqq_d)
    Bq = _einsum_hi("w q a b, q b c -> w q a c", Hcq_s, Hqq_inv)

    corr = (_einsum_hi("w p a b, v p c b -> w v a c", Bp, Hcp_s)
            + _einsum_hi("w q a b, v q c b -> w v a c", Bq, Hcq_s))
    g_corr = (_einsum_hi("w p a b, p b -> w a", Bp, gp_s)
              + _einsum_hi("w q a b, q b -> w a", Bq, gq_s))
    corr = jax.lax.psum(corr, axis)          # distributed Schur reduction
    g_corr = jax.lax.psum(g_corr, axis)

    S = lba_mod.H_cc_block_diag(H_cc, W) - corr
    g_red = g_c - g_corr
    idx = jnp.arange(W)
    damp = lam * jnp.maximum(jnp.diagonal(H_cc, axis1=-2, axis2=-1), 1e-3)
    S = S.at[idx, idx].add(damp[..., None] * jnp.eye(6) + 1e-6 * jnp.eye(6))
    pin = jnp.where(kf_free, 0.0, 1e8)
    S = S.at[idx, idx].add(pin[:, None, None] * jnp.eye(6))
    Sm = S.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
    dxi = -jnp.linalg.solve(Sm, g_red.reshape(-1)).reshape(W, 6)
    dxi = jnp.where(kf_free[:, None], dxi, 0.0)

    # stage 3: local back-substitution, then all_gather the shards
    rhs_p = gp_s + _einsum_hi("w p a b, w a -> p b", Hcp_s, dxi)
    d_pt_s = -_einsum_hi("p a b, p b -> p a", Hpp_inv, rhs_p)
    d_pt_s = jnp.where((jnp.diagonal(Hpp_s, axis1=-2, axis2=-1).sum(-1) > 0
                        )[:, None], d_pt_s, 0.0)
    rhs_q = gq_s + _einsum_hi("w q a b, w a -> q b", Hcq_s, dxi)
    d_ep_s = -_einsum_hi("q a b, q b -> q a", Hqq_inv, rhs_q)
    d_ep_s = jnp.where((jnp.diagonal(Hqq_s, axis1=-2, axis2=-1).sum(-1) > 0
                        )[:, None], d_ep_s, 0.0)
    d_pt = jax.lax.all_gather(d_pt_s, axis, tiled=True)
    d_ep = jax.lax.all_gather(d_ep_s, axis, tiled=True)
    return dxi, d_pt, d_ep


def make_dist_lba_step(mesh, cam: StereoCamera, axis: str = "lm"):
    """Build a jitted sharded LBA step for one problem.

    The returned fn(problem, lam) -> (dxi, d_pt, d_ep) shards the
    observation-slot axis and landmark arrays over ``axis`` of ``mesh``.
    """
    n_dev = mesh.shape[axis]

    def step(problem: lba_mod.LBAProblem, lam):
        blocks = _local_assemble(problem, cam, axis)
        return _schur_solve_local(
            *blocks, (~problem.kf_fixed) & problem.kf_valid, lam, axis, n_dev)

    rep = P()
    obs_pt_spec = lba_mod.LBAProblem(
        kf_pose=rep, kf_fixed=rep, kf_valid=rep,
        pt_pos=rep, ep_pos=rep,
        obs_pt_uv=P(None, axis, None), obs_pt_disp=P(None, axis),
        obs_pt_id=P(None, axis),
        obs_ln_le=P(None, axis, None), obs_ln_sid=P(None, axis),
        obs_ln_eid=P(None, axis))
    fn = shard_map_fn(step, mesh,
                      in_specs=(obs_pt_spec, rep),
                      out_specs=(rep, rep, rep), check=False)
    return jax.jit(fn)


def make_dist_lba_step_dp(mesh, cam: StereoCamera, kf_axis: str = "kf",
                          lm_axis: str = "lm"):
    """Data-parallel windows x landmark-sharded Schur on a 2D mesh.

    The 'kf' mesh axis runs INDEPENDENT LBA windows (map blocks /
    trajectory segments — e.g. concurrent sequences, BASELINE.json's
    multi-host configuration) while each window's Schur reduction is
    sharded over the 'lm' axis exactly as make_dist_lba_step. Input is a
    batched LBAProblem with a leading window axis (length divisible by
    mesh.shape['kf']); returns batched (dxi, d_pt, d_ep).
    """
    n_lm = mesh.shape[lm_axis]

    def step(problems: lba_mod.LBAProblem, lam):
        def one(problem):
            blocks = _local_assemble(problem, cam, lm_axis)
            return _schur_solve_local(
                *blocks, (~problem.kf_fixed) & problem.kf_valid, lam,
                lm_axis, n_lm)
        return jax.vmap(one)(problems)

    g = P(kf_axis)
    prob_spec = lba_mod.LBAProblem(
        kf_pose=g, kf_fixed=g, kf_valid=g, pt_pos=g, ep_pos=g,
        obs_pt_uv=P(kf_axis, None, lm_axis, None),
        obs_pt_disp=P(kf_axis, None, lm_axis),
        obs_pt_id=P(kf_axis, None, lm_axis),
        obs_ln_le=P(kf_axis, None, lm_axis, None),
        obs_ln_sid=P(kf_axis, None, lm_axis),
        obs_ln_eid=P(kf_axis, None, lm_axis))
    fn = shard_map_fn(step, mesh, in_specs=(prob_spec, P()),
                      out_specs=(g, g, g), check=False)
    return jax.jit(fn)
