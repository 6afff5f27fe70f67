"""Distributed local bundle adjustment over a TPU mesh — SHARDED MAP.

NEW capability (no reference equivalent — SURVEY.md §2.3 P5/P6): the
reference is a single-process CPU system; its scaling story ends at two
std::threads. Here both the LANDMARK STATE and the solver are sharded
with ``shard_map`` over the mesh's 'lm' axis:

  ownership   : landmark g belongs to shard g % n (round-robin, so the
                recency-skewed observation load balances); lines own
                both their endpoints. ``bucket_problem_by_owner``
                permutes a problem into this layout and routes every
                observation slot to its landmark's owner shard.
  assembly    : each device builds H_pp, g_p and its H_cp COLUMNS from
                its own observation slice only — no dense (W, P) block
                ever exists globally, and landmark positions live
                sharded end to end (a map larger than one device's HBM
                works).
  reduction   : the only collectives are the reduced camera system —
                psum of H_cc (W,6,6), g_c (W,6), the Schur correction
                (W,W,6,6), g_corr (W,6) and two robust-scale scalars:
                ~16 KB per step at W=10, INDEPENDENT of the landmark
                count (the round-1 design psummed O(W*P) dense blocks).
                See ``comm_bytes_per_step`` + the HLO-verified test.
  back-sub    : landmark updates are computed and REMAIN on their owner
                shard (out_specs P('lm')).

  The 'kf' mesh axis runs independent LBA windows (map blocks /
  trajectory segments) data-parallel — the distributed-BA layout of
  BASELINE.json's north star.

Correctness contract: the step is invariant to the device count (1-dev
mesh == N-dev mesh up to f32 reduction order) — asserted in tests on a
CPU mesh, and across two real OS processes in tests/test_multihost.py.
It intentionally differs from backend.lba in ONE place: the robust
scale uses the collective-friendly mean-|r| estimator
(sigma = 1.2533 * mean|r|) instead of the median-based MAD, which would
need a distributed selection; both are consistent scale estimators for
the same weight family.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
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


# ---------------------------------------------------------------------------
# owner-sharded problem layout
# ---------------------------------------------------------------------------

class BucketedProblem(NamedTuple):
    problem: lba_mod.LBAProblem   # owner-sharded layout, LOCAL landmark ids
    pt_perm: jnp.ndarray          # (P,) original id -> bucketed row
    ep_perm: jnp.ndarray          # (Q,) original endpoint -> bucketed row
    n_dropped: jnp.ndarray        # obs slots lost to per-shard capacity


def _bucket_rows(ids, n: int, cap: int, lm_shard: int, payload):
    """Route each obs slot of every row to its owner's contiguous slice.

    ids (W, K) landmark ids in ORIGINAL order (-1 invalid) with owner =
    id % n; payload: pytree of (W, K, ...) arrays moved along. Returns
    (bucketed_ids (W, K), payload_bucketed, n_dropped) where column
    slice [d*cap, (d+1)*cap) holds owner d's observations, and ids are
    in the BUCKETED GLOBAL layout (owner * lm_shard + id // n — shards
    subtract their axis offset to obtain local ids)."""
    W, K = ids.shape

    def row(ids_r, pay_r):
        owner = jnp.where(ids_r >= 0, ids_r % n, n)
        srt = jnp.argsort(owner, stable=True)
        o_s = owner[srt]
        start = jnp.searchsorted(o_s, o_s, side="left")
        rank = jnp.arange(K) - start
        ok = (o_s < n) & (rank < cap)
        dest = jnp.where(ok, o_s * cap + rank, K)
        ids_s = ids_r[srt]
        new_id = jnp.where(ok, o_s * lm_shard + ids_s // n, -1)
        out_ids = jnp.full((K,), -1, jnp.int32).at[dest].set(
            new_id.astype(jnp.int32), mode="drop")
        out_pay = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x).at[dest].set(x[srt], mode="drop"),
            pay_r)
        dropped = jnp.sum((o_s < n) & ~ok)
        return out_ids, out_pay, dropped

    out_ids, out_pay, dropped = jax.vmap(row)(ids, payload)
    return out_ids, out_pay, jnp.sum(dropped)


@partial(jax.jit, static_argnames=("n",))
def bucket_problem_by_owner(prob: lba_mod.LBAProblem, n: int
                            ) -> BucketedProblem:
    """Permute a global-layout problem into the owner-sharded layout.

    Landmarks: round-robin ownership (id %% n), local id = id // n;
    lines own BOTH endpoints (owner = line %% n), so a line's two
    endpoint residuals always land on one shard. Observation slots are
    routed to their owner's column slice (capacity K//n per shard; the
    rare overflow beyond a shard's slice is dropped and counted).
    """
    Pn = prob.pt_pos.shape[0]
    Q = prob.ep_pos.shape[0]
    W, K = prob.obs_pt_id.shape
    L = prob.obs_ln_sid.shape[1]
    assert Pn % n == 0 and Q % (2 * n) == 0 and K % n == 0 and L % n == 0

    # landmark permutations: bucketed_row(old) = owner*size + local
    g = jnp.arange(Pn)
    pt_perm = (g % n) * (Pn // n) + g // n
    pt_pos = jnp.zeros_like(prob.pt_pos).at[pt_perm].set(prob.pt_pos)

    m = jnp.arange(Q // 2)                      # line ids
    line_perm = (m % n) * (Q // (2 * n)) + m // n
    e = jnp.arange(Q)
    ep_perm = 2 * line_perm[e // 2] + e % 2
    ep_pos = jnp.zeros_like(prob.ep_pos).at[ep_perm].set(prob.ep_pos)

    # point observations: owner by point id
    obs_pt_id, pay, drop_p = _bucket_rows(
        prob.obs_pt_id, n, K // n, Pn // n,
        (prob.obs_pt_uv, prob.obs_pt_disp))
    obs_pt_uv, obs_pt_disp = pay

    # line observations: owner by LINE id (sid // 2); both endpoint ids
    # become bucketed endpoint indices 2*bucketed_line + (0|1)
    line_of = jnp.where(prob.obs_ln_sid >= 0, prob.obs_ln_sid // 2, -1)
    line_new, pay, drop_l = _bucket_rows(
        line_of, n, L // n, Q // (2 * n),
        (prob.obs_ln_le, prob.obs_ln_sid % 2, prob.obs_ln_eid % 2))
    obs_ln_le, s_par, e_par = pay
    obs_ln_sid = jnp.where(line_new >= 0, 2 * line_new + s_par, -1)
    obs_ln_eid = jnp.where(line_new >= 0, 2 * line_new + e_par, -1)

    new_prob = prob._replace(
        pt_pos=pt_pos, ep_pos=ep_pos,
        obs_pt_uv=obs_pt_uv, obs_pt_disp=obs_pt_disp, obs_pt_id=obs_pt_id,
        obs_ln_le=obs_ln_le, obs_ln_sid=obs_ln_sid, obs_ln_eid=obs_ln_eid)
    return BucketedProblem(new_prob, pt_perm, ep_perm, drop_p + drop_l)


def unbucket_landmarks(x_bucketed: jnp.ndarray, perm: jnp.ndarray
                       ) -> jnp.ndarray:
    """Map owner-sharded landmark rows back to the original order."""
    return x_bucketed[perm]


def comm_bytes_per_step(W: int) -> int:
    """Analytic all-reduce volume of one sharded step (f32 bytes):
    H_cc (W,6,6) + g_c (W,6) + Schur correction (W,W,6,6) + g_corr (W,6)
    + 2 robust-scale scalars — independent of the landmark count."""
    return 4 * (W * 36 + W * 6 + W * W * 36 + W * 6 + 2)


# ---------------------------------------------------------------------------
# the sharded step
# ---------------------------------------------------------------------------

def _to_local_ids(problem: lba_mod.LBAProblem, axis: str
                  ) -> lba_mod.LBAProblem:
    """ids arrive in the bucketed GLOBAL layout; this shard's landmarks
    occupy [me*P_loc, (me+1)*P_loc) — convert to local indices."""
    me = jax.lax.axis_index(axis)
    P_loc = problem.pt_pos.shape[0]
    Q_loc = problem.ep_pos.shape[0]
    to_local = lambda ids, size: jnp.where(ids >= 0, ids - me * size, -1)
    return problem._replace(
        obs_pt_id=to_local(problem.obs_pt_id, P_loc),
        obs_ln_sid=to_local(problem.obs_ln_sid, Q_loc),
        obs_ln_eid=to_local(problem.obs_ln_eid, Q_loc))


def _shard_residuals(problem: lba_mod.LBAProblem, cam: StereoCamera,
                     axis: str):
    """Local residuals + GLOBAL robust scale (collective mean |r|).
    Assumes LOCAL ids. Returns (r, rn, rs, re, jacs..., weights...)."""
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
    n_ok = jax.lax.psum(jnp.sum(ok) + jnp.sum(oks) + jnp.sum(oke), axis)
    s_abs = jax.lax.psum(jnp.sum(jnp.where(ok, rn, 0.0))
                         + jnp.sum(jnp.where(oks, jnp.abs(rs), 0.0))
                         + jnp.sum(jnp.where(oke, jnp.abs(re), 0.0)), axis)
    sigma = jnp.maximum(1.2533 * s_abs / jnp.maximum(n_ok, 1), 1e-4)
    w = jnp.where(ok, robust.tstudent_weight(rn, sigma), 0.0)
    ws = jnp.where(oks, robust.tstudent_weight(jnp.abs(rs), sigma), 0.0)
    we = jnp.where(oke, robust.tstudent_weight(jnp.abs(re), sigma), 0.0)
    return (r, rn, rs, re, Jc, Jp, Jcs, Jps, Jce, Jpe,
            ok, oks, oke, w, ws, we, sigma)


def _shard_cost(problem: lba_mod.LBAProblem, cam: StereoCamera,
                axis: str):
    """Robust total cost across shards (LOCAL ids). Mirrors
    backend.lba.lba_cost exactly, including the lost-observation
    saturation charge (see there: without it, invalidating residuals by
    catapulting a pose reads as a cost decrease)."""
    out = _shard_residuals(problem, cam, axis)
    rn, rs, re = out[1], out[2], out[3]
    (ok, oks, oke, w, ws, we) = out[10:16]
    sigma = out[16]                     # collective scale (same all shards)
    n_lost = (jnp.sum((problem.obs_pt_id >= 0) & ~ok)
              + jnp.sum((problem.obs_ln_sid >= 0) & ~oks)
              + jnp.sum((problem.obs_ln_eid >= 0) & ~oke))
    local = (jnp.sum(w * rn ** 2) + jnp.sum(ws * rs ** 2)
             + jnp.sum(we * re ** 2)
             + 6.0 * sigma * sigma * n_lost)
    return jax.lax.psum(local, axis)


def _owner_shard_step(problem: lba_mod.LBAProblem, lam, cam: StereoCamera,
                      axis: str):
    """Runs per shard: local landmark state + local observation slice.
    Only the reduced camera system crosses devices. Converts bucketed-
    global ids to local first (one-shot callers)."""
    return _owner_shard_step_local(_to_local_ids(problem, axis), lam,
                                   cam, axis)


def _owner_shard_step_local(problem: lba_mod.LBAProblem, lam,
                            cam: StereoCamera, axis: str):
    """The damped sharded step, assuming LOCAL observation ids."""
    W = problem.kf_pose.shape[0]
    (r, rn, rs, re, Jc, Jp, Jcs, Jps, Jce, Jpe,
     ok, oks, oke, w, ws, we, _sigma) = _shard_residuals(problem, cam, axis)

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
    H_cc = jax.lax.psum(H_cc, axis)
    g_c = jax.lax.psum(g_c, axis)

    # ---- LOCAL landmark blocks (one one-hot contraction per family) ----
    Pn_loc = problem.pt_pos.shape[0]
    Q_loc = problem.ep_pos.shape[0]
    Hpp, g_p, H_cp = lba_mod._bin_landmark_blocks(
        problem.obs_pt_id, Pn_loc,
        _einsum_hi("w k, w k i a, w k i b -> w k a b", w, Jp, Jp),
        _einsum_hi("w k, w k i a, w k i -> w k a", w, Jp, r),
        _einsum_hi("w k, w k i a, w k i b -> w k a b", w, Jc, Jp))
    Hqq = jnp.zeros((Q_loc, 3, 3))
    g_q = jnp.zeros((Q_loc, 3))
    H_cq = jnp.zeros((W, Q_loc, 6, 3))
    for (ids_, ww, Jcx, Jpx, rx) in ((problem.obs_ln_sid, ws, Jcs, Jps, rs),
                                     (problem.obs_ln_eid, we, Jce, Jpe, re)):
        Hq1, gq1, Hcq1 = lba_mod._bin_landmark_blocks(
            ids_, Q_loc,
            _einsum_hi("w l, w l a, w l b -> w l a b", ww, Jpx, Jpx),
            _einsum_hi("w l, w l a, w l -> w l a", ww, Jpx, rx),
            _einsum_hi("w l, w l a, w l b -> w l a b", ww, Jcx, Jpx))
        Hqq, g_q, H_cq = Hqq + Hq1, g_q + gq1, H_cq + Hcq1

    # ---- damping + local landmark inverses ------------------------------
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + (lam * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-3))[..., None] * eye3
    Hqq_d = Hqq + (lam * jnp.maximum(
        jnp.diagonal(Hqq, axis1=-2, axis2=-1), 1e-3))[..., None] * eye3
    Hpp_inv = lie.inv3(Hpp_d)
    Hqq_inv = lie.inv3(Hqq_d)
    Bp = _einsum_hi("w p a b, p b c -> w p a c", H_cp, Hpp_inv)
    Bq = _einsum_hi("w q a b, q b c -> w q a c", H_cq, Hqq_inv)

    # ---- distributed Schur reduction: the ONLY big collective ----------
    corr = (_einsum_hi("w p a b, v p c b -> w v a c", Bp, H_cp)
            + _einsum_hi("w q a b, v q c b -> w v a c", Bq, H_cq))
    g_corr = (_einsum_hi("w p a b, p b -> w a", Bp, g_p)
              + _einsum_hi("w q a b, q b -> w a", Bq, g_q))
    corr = jax.lax.psum(corr, axis)
    g_corr = jax.lax.psum(g_corr, axis)

    S = lba_mod.H_cc_block_diag(H_cc, W) - corr
    g_red = g_c - g_corr
    idx = jnp.arange(W)
    damp = lam * jnp.maximum(jnp.diagonal(H_cc, axis1=-2, axis2=-1), 1e-3)
    S = S.at[idx, idx].add(damp[..., None] * jnp.eye(6) + 1e-6 * jnp.eye(6))
    # pin free poses with no residual support too (cost-neutral fp
    # noise otherwise walks them — see backend.lba._assemble_and_solve)
    support = jnp.diagonal(H_cc, axis1=-2, axis2=-1).sum(-1)
    pin = jnp.where(free & (support > 1.0), 0.0, 1e8)
    S = S.at[idx, idx].add(pin[:, None, None] * jnp.eye(6))
    Sm = S.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
    dxi = -jnp.linalg.solve(Sm, g_red.reshape(-1)).reshape(W, 6)
    dxi = jnp.where(free[:, None], dxi, 0.0)

    # ---- back-substitution: landmark updates STAY on their shard -------
    rhs_p = g_p + _einsum_hi("w p a b, w a -> p b", H_cp, dxi)
    d_pt = -_einsum_hi("p a b, p b -> p a", Hpp_inv, rhs_p)
    d_pt = jnp.where((jnp.diagonal(Hpp, axis1=-2, axis2=-1).sum(-1) > 1e-2
                      )[:, None], d_pt, 0.0)
    rhs_q = g_q + _einsum_hi("w q a b, w a -> q b", H_cq, dxi)
    d_ep = -_einsum_hi("q a b, q b -> q a", Hqq_inv, rhs_q)
    d_ep = jnp.where((jnp.diagonal(Hqq, axis1=-2, axis2=-1).sum(-1) > 1e-2
                      )[:, None], d_ep, 0.0)
    return dxi, d_pt, d_ep


def _problem_specs(kf_axis, lm_axis):
    g = P(kf_axis) if kf_axis else P()
    def obs(*tail):
        parts = ((kf_axis,) if kf_axis else ()) + (None, lm_axis) + tail
        return P(*parts)
    def lmk():
        parts = ((kf_axis,) if kf_axis else ()) + (lm_axis,)
        return P(*parts)
    return lba_mod.LBAProblem(
        kf_pose=g, kf_fixed=g, kf_valid=g,
        pt_pos=lmk(), ep_pos=lmk(),
        obs_pt_uv=obs(None), obs_pt_disp=obs(), obs_pt_id=obs(),
        obs_ln_le=obs(None), obs_ln_sid=obs(), obs_ln_eid=obs())


def make_dist_lba_step(mesh, cam: StereoCamera, axis: str = "lm"):
    """Build a jitted owner-sharded LBA step.

    The problem MUST be in the owner-sharded layout produced by
    ``bucket_problem_by_owner(prob, mesh.shape[axis])``: landmark state
    arrays are sharded over ``axis`` and each observation-column slice
    references its shard's landmarks by LOCAL id. Returns
    fn(problem, lam) -> (dxi replicated, d_pt sharded, d_ep sharded).
    """
    def step(problem: lba_mod.LBAProblem, lam):
        return _owner_shard_step(problem, lam, cam, axis)

    fn = shard_map_fn(step, mesh,
                      in_specs=(_problem_specs(None, axis), P()),
                      out_specs=(P(), P(axis), P(axis)), check=False)
    return jax.jit(fn)


def make_dist_lba_lm(mesh, cam: StereoCamera, iters: int,
                     lam0: float, lam_factor: float, axis: str = "lm"):
    """Full sharded robust-LM solve (the live-system entry point).

    One jitted program: ``iters`` accept/reject LM iterations, each an
    owner-sharded step + a sharded cost evaluation — the same loop
    backend.lba.run_lba runs densely, with the distributed robust scale
    (mean |r|). Input must be in the owner-sharded layout
    (bucket_problem_by_owner). Returns
    fn(problem) -> (kf_pose (W,4,4) replicated, pt_pos sharded,
    ep_pos sharded, cost0, cost1).
    """
    from jax import lax

    def lm(problem: lba_mod.LBAProblem):
        problem = _to_local_ids(problem, axis)
        cost0 = _shard_cost(problem, cam, axis)

        def body(_, carry):
            prob, lam, cost = carry
            dxi, d_pt, d_ep = _owner_shard_step_local(prob, lam, cam, axis)
            # trust-region caps, identical to the dense loop (see
            # backend.lba.run_lba: saturating robust kernels make
            # all-outlier poses cost-neutral to move arbitrarily)
            dxi, d_pt, d_ep = lba_mod._cap_steps(dxi, d_pt, d_ep)
            new_pose = jax.vmap(
                lambda d, T: lie.mm(lie.exp_se3(d), T))(dxi, prob.kf_pose)
            trial = prob._replace(kf_pose=new_pose,
                                  pt_pos=prob.pt_pos + d_pt,
                                  ep_pos=prob.ep_pos + d_ep)
            c_try = _shard_cost(trial, cam, axis)
            finite = (jnp.isfinite(c_try) & jnp.all(jnp.isfinite(dxi))
                      & jnp.all(jnp.isfinite(d_pt))
                      & jnp.all(jnp.isfinite(d_ep)))
            # every shard sees identical psum'd costs, so the accept
            # decision is replicated by construction — except the
            # d_pt/d_ep finiteness, which is shard-local: make it global
            finite = jax.lax.pmin(finite.astype(jnp.int32), axis) > 0
            accept = finite & (c_try < cost)
            prob = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    jnp.reshape(accept, (1,) * a.ndim) if a.ndim else accept,
                    a, b), trial, prob)
            lam_new = jnp.where(accept, lam * (1.0 / lam_factor),
                                lam * lam_factor)
            return prob, lam_new, jnp.where(accept, c_try, cost)

        problem1, _, cost1 = lax.fori_loop(
            0, iters, body, (problem, jnp.asarray(lam0), cost0))
        return problem1.kf_pose, problem1.pt_pos, problem1.ep_pos, \
            cost0, cost1

    spec = _problem_specs(None, axis)
    fn = shard_map_fn(lm, mesh, in_specs=(spec,),
                      out_specs=(P(), P(axis), P(axis), P(), P()),
                      check=False)
    return jax.jit(fn)


def make_dist_lba_step_dp(mesh, cam: StereoCamera, kf_axis: str = "kf",
                          lm_axis: str = "lm"):
    """Data-parallel windows x owner-sharded Schur on a 2D mesh.

    The 'kf' mesh axis runs INDEPENDENT LBA windows (map blocks /
    trajectory segments — e.g. concurrent sequences, BASELINE.json's
    multi-host configuration) while each window's landmark state and
    Schur reduction shard over 'lm' exactly as make_dist_lba_step.
    Input: a batched owner-sharded LBAProblem with a leading window axis
    (length divisible by mesh.shape['kf']); returns batched
    (dxi, d_pt, d_ep).
    """
    def step(problems: lba_mod.LBAProblem, lam):
        return jax.vmap(
            lambda p: _owner_shard_step(p, lam, cam, lm_axis))(problems)

    g = P(kf_axis)
    fn = shard_map_fn(
        step, mesh,
        in_specs=(_problem_specs(kf_axis, lm_axis), P()),
        out_specs=(g, P(kf_axis, lm_axis), P(kf_axis, lm_axis)),
        check=False)
    return jax.jit(fn)
