"""Local bundle adjustment: robust LM with explicit Schur complement.

Reference parity: pl-slam ``src/mapHandler.cpp`` —
``localBundleAdjustment`` / ``levMarquardtOptimizationLBA``: jointly
optimize the last-N keyframe poses + observed landmark positions (3D
points and line endpoint pairs) against point-reprojection and
point-to-line residuals with robust weights; older KFs observing the
same landmarks stay fixed but contribute residuals.

TPU formulation: the landmark block H_pp is block-diagonal 3x3 (line
endpoints are treated as independent 3D endpoint landmarks with scalar
point-to-line residuals, so they get 3x3 blocks too, matching the
reference's endpoint parametrization). The reduced camera system

    S = H_cc - H_cp H_pp^{-1} H_pc

is assembled with batched einsums (MXU) and one scatter-add per
assembly; the dense (6W x 6W) solve is trivial. All shapes static:
W window poses, P point landmarks, Q line-endpoint landmarks, K/L
observation slots per KF.

Conventions: kf_pose passed here is T_cw (world-to-camera), updated by
left multiplication T <- exp(dxi) T. Residuals/Jacobians exactly as in
tracking.pose_gn.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie, robust
from plslam_tpu.core.camera import StereoCamera

def _einsum_hi(*args, **kw):
    """einsum at full f32 precision: TPU-default bf16 matmul passes are
    too coarse for normal-equation/Schur assembly (see core.lie.mm)."""
    kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)



class LBAProblem(NamedTuple):
    """Static-shape LBA inputs.

    Point observations: slot (w, k) of obs_pt_uv observes point landmark
    obs_pt_id[w, k] (or -1). Line observations: slot (w, l) gives the
    observed 2D line obs_ln_le and TWO endpoint-landmark ids
    obs_ln_sid/obs_ln_eid into the shared endpoint array ep_pos.
    """
    kf_pose: jnp.ndarray      # (W, 4, 4) T_cw
    kf_fixed: jnp.ndarray     # (W,) bool — contribute residuals, not vars
    kf_valid: jnp.ndarray     # (W,) bool
    pt_pos: jnp.ndarray       # (P, 3) world points
    ep_pos: jnp.ndarray       # (Q, 3) world line endpoints
    obs_pt_uv: jnp.ndarray    # (W, K, 2)
    obs_pt_disp: jnp.ndarray  # (W, K) observed stereo disparity (<=0: skip)
    obs_pt_id: jnp.ndarray    # (W, K) int32 in [-1, P)
    obs_ln_le: jnp.ndarray    # (W, L, 3) normalized observed line eqs
    obs_ln_sid: jnp.ndarray   # (W, L) int32 in [-1, Q)
    obs_ln_eid: jnp.ndarray   # (W, L) int32 in [-1, Q)


class LBAResult(NamedTuple):
    kf_pose: jnp.ndarray      # (W, 4, 4) optimized T_cw
    pt_pos: jnp.ndarray       # (P, 3)
    ep_pos: jnp.ndarray       # (Q, 3)
    cost0: jnp.ndarray
    cost1: jnp.ndarray
    obs_pt_inlier: jnp.ndarray  # (W, K) bool (post-hoc outlier flags)
    obs_ln_inlier: jnp.ndarray  # (W, L) bool


def _point_rj(kf_pose, pt_pos, obs_uv, obs_disp, obs_id, cam):
    """Residuals + Jacobians for all point observation slots.

    Stereo observation model (the reference is a stereo system; the
    disparity residual pins the scale gauge of the window):
        r = (u - u_obs, v - v_obs, d - d_obs),  d = fx*b/z.
    Returns r (W,K,3), Jc (W,K,3,6), Jp (W,K,3,3), valid (W,K).
    """
    ids = jnp.maximum(obs_id, 0)
    Xw = pt_pos[ids]                                   # (W, K, 3)
    R = kf_pose[:, :3, :3]
    t = kf_pose[:, :3, 3]
    Pc = _einsum_hi("w a b, w k b -> w k a", R, Xw) + t[:, None, :]
    ok = (obs_id >= 0) & (Pc[..., 2] > 0.1)
    uv = cam.project(Pc)
    z = jnp.maximum(Pc[..., 2], 1e-6)
    disp = cam.fx * cam.b / z
    has_d = obs_disp > 0
    r_uv = uv - obs_uv
    r_d = jnp.where(has_d, disp - obs_disp, 0.0)
    r = jnp.where(ok[..., None],
                  jnp.concatenate([r_uv, r_d[..., None]], axis=-1), 0.0)
    Jproj = cam.project_jacobian(Pc)                   # (W, K, 2, 3)
    # disparity row: d(fx b / z)/dPc = (0, 0, -fx b / z^2)
    zz = jnp.zeros_like(z)
    Jd = jnp.stack([zz, zz, -cam.fx * cam.b / (z * z)], axis=-1)[..., None, :]
    Jd = jnp.where(has_d[..., None, None], Jd, 0.0)
    Jproj3 = jnp.concatenate([Jproj, Jd], axis=-2)     # (W, K, 3, 3)
    I = jnp.broadcast_to(jnp.eye(3), Pc.shape[:-1] + (3, 3))
    Jse3 = jnp.concatenate([I, -lie.skew(Pc)], axis=-1)  # (W, K, 3, 6)
    Jc = lie.mm(Jproj3, Jse3)
    Jp = _einsum_hi("w k a b, w b c -> w k a c", Jproj3, R)
    Jc = jnp.where(ok[..., None, None], Jc, 0.0)
    Jp = jnp.where(ok[..., None, None], Jp, 0.0)
    return r, Jc, Jp, ok


def _endpoint_rj(kf_pose, ep_pos, obs_le, obs_id, cam):
    """Scalar point-to-line residuals for one endpoint family.

    Returns r (W,L), Jc (W,L,6), Jp (W,L,3), valid (W,L).
    """
    ids = jnp.maximum(obs_id, 0)
    Xw = ep_pos[ids]
    R = kf_pose[:, :3, :3]
    t = kf_pose[:, :3, 3]
    Pc = _einsum_hi("w a b, w l b -> w l a", R, Xw) + t[:, None, :]
    ok = (obs_id >= 0) & (Pc[..., 2] > 0.1)
    uv = cam.project(Pc)
    r = obs_le[..., 0] * uv[..., 0] + obs_le[..., 1] * uv[..., 1] + obs_le[..., 2]
    r = jnp.where(ok, r, 0.0)
    Jproj = cam.project_jacobian(Pc)                   # (W, L, 2, 3)
    lexy = obs_le[..., :2]
    Jpix = _einsum_hi("w l i, w l i c -> w l c", lexy, Jproj)  # (W, L, 3)
    I = jnp.broadcast_to(jnp.eye(3), Pc.shape[:-1] + (3, 3))
    Jse3 = jnp.concatenate([I, -lie.skew(Pc)], axis=-1)
    Jc = _einsum_hi("w l c, w l c s -> w l s", Jpix, Jse3)     # (W, L, 6)
    Jp = _einsum_hi("w l c, w c b -> w l b", Jpix, R)          # (W, L, 3)
    Jc = jnp.where(ok[..., None], Jc, 0.0)
    Jp = jnp.where(ok[..., None], Jp, 0.0)
    return r, Jc, Jp, ok


def _robust_sigma(r_pt_norm, ok_pt, r_s, ok_s, r_e, ok_e):
    allr = jnp.concatenate([r_pt_norm.reshape(-1), jnp.abs(r_s).reshape(-1),
                            jnp.abs(r_e).reshape(-1)])
    allv = jnp.concatenate([ok_pt.reshape(-1), ok_s.reshape(-1),
                            ok_e.reshape(-1)])
    return robust.mad_scale_zero_centered(allr, allv)


def lba_cost(problem: LBAProblem, cam: StereoCamera) -> jnp.ndarray:
    """Robust total cost (for LM accept/reject).

    Observations that EXIST (obs_id >= 0) but fail the behind-camera
    validity gate are charged the t-student saturation cost
    (dof+1)*sigma^2 instead of vanishing: without the charge, a step
    that catapults a pose far enough to invalidate all its residuals
    strictly DECREASES the cost and the LM accept guard embraces it —
    the round-5 endurance run measured window KFs thrown to 1e8 m
    through exactly this loophole. With the charge, losing an
    observation can never beat keeping it at any residual magnitude.
    """
    r, _, _, ok = _point_rj(problem.kf_pose, problem.pt_pos,
                            problem.obs_pt_uv, problem.obs_pt_disp,
                            problem.obs_pt_id, cam)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    rs, _, _, oks = _endpoint_rj(problem.kf_pose, problem.ep_pos,
                                 problem.obs_ln_le, problem.obs_ln_sid, cam)
    re, _, _, oke = _endpoint_rj(problem.kf_pose, problem.ep_pos,
                                 problem.obs_ln_le, problem.obs_ln_eid, cam)
    sigma = _robust_sigma(rn, ok, rs, oks, re, oke)
    w_pt = jnp.where(ok, robust.tstudent_weight(rn, sigma), 0.0)
    w_s = jnp.where(oks, robust.tstudent_weight(jnp.abs(rs), sigma), 0.0)
    w_e = jnp.where(oke, robust.tstudent_weight(jnp.abs(re), sigma), 0.0)
    n_lost = (jnp.sum((problem.obs_pt_id >= 0) & ~ok)
              + jnp.sum((problem.obs_ln_sid >= 0) & ~oks)
              + jnp.sum((problem.obs_ln_eid >= 0) & ~oke))
    lost_penalty = 6.0 * sigma * sigma    # (dof+1) sigma^2 saturation
    return (jnp.sum(w_pt * rn ** 2) + jnp.sum(w_s * rs ** 2)
            + jnp.sum(w_e * re ** 2) + lost_penalty * n_lost)


def _bin_landmark_blocks(obs_id, n_lm: int, c_hh, c_g, c_ch):
    """Sum per-observation normal-equation contributions onto landmark
    slots: one (W, K, n_lm) one-hot contraction over a concatenated
    payload (Hxx 3x3 | g 3 | H_cx 6x3). obs_id < 0 rows bin nowhere.
    Returns (Hxx (n,3,3), g (n,3), H_cx (W,n,6,3))."""
    W, K = obs_id.shape
    payload = jnp.concatenate(
        [c_hh.reshape(W, K, 9), c_g, c_ch.reshape(W, K, 18)], axis=-1)
    onehot = (obs_id[..., None] == jnp.arange(n_lm, dtype=jnp.int32)
              ).astype(jnp.float32)                      # (W, K, n)
    out = _einsum_hi("w k n, w k c -> w n c", onehot, payload)
    Hxx = jnp.sum(out[..., :9], axis=0).reshape(n_lm, 3, 3)
    g = jnp.sum(out[..., 9:12], axis=0)
    H_cx = out[..., 12:].reshape(W, n_lm, 6, 3)
    return Hxx, g, H_cx


def _assemble_and_solve(problem: LBAProblem, cam: StereoCamera, lam,
                        pin_weight: float = 1e8):
    """One damped step: returns (dxi (W,6), d_pt (P,3), d_ep (Q,3))."""
    W = problem.kf_pose.shape[0]
    P = problem.pt_pos.shape[0]
    Q = problem.ep_pos.shape[0]

    r, Jc, Jp, ok = _point_rj(problem.kf_pose, problem.pt_pos,
                              problem.obs_pt_uv, problem.obs_pt_disp,
                              problem.obs_pt_id, cam)
    rs, Jcs, Jps, oks = _endpoint_rj(problem.kf_pose, problem.ep_pos,
                                     problem.obs_ln_le, problem.obs_ln_sid, cam)
    re, Jce, Jpe, oke = _endpoint_rj(problem.kf_pose, problem.ep_pos,
                                     problem.obs_ln_le, problem.obs_ln_eid, cam)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    sigma = _robust_sigma(rn, ok, rs, oks, re, oke)
    w = jnp.where(ok, robust.tstudent_weight(rn, sigma), 0.0)
    ws = jnp.where(oks, robust.tstudent_weight(jnp.abs(rs), sigma), 0.0)
    we = jnp.where(oke, robust.tstudent_weight(jnp.abs(re), sigma), 0.0)

    # fixed/invalid KFs contribute residuals but no pose variables
    free = (~problem.kf_fixed) & problem.kf_valid
    Jc = jnp.where(free[:, None, None, None], Jc, 0.0)
    Jcs = jnp.where(free[:, None, None], Jcs, 0.0)
    Jce = jnp.where(free[:, None, None], Jce, 0.0)

    # ---- camera blocks -------------------------------------------------
    H_cc = (_einsum_hi("w k, w k i a, w k i b -> w a b", w, Jc, Jc)
            + _einsum_hi("w l, w l a, w l b -> w a b", ws, Jcs, Jcs)
            + _einsum_hi("w l, w l a, w l b -> w a b", we, Jce, Jce))
    g_c = (_einsum_hi("w k, w k i a, w k i -> w a", w, Jc, r)
           + _einsum_hi("w l, w l a, w l -> w a", ws, Jcs, rs)
           + _einsum_hi("w l, w l a, w l -> w a", we, Jce, re))

    # ---- landmark blocks -------------------------------------------------
    # Per-observation contributions are binned onto landmark slots with ONE
    # one-hot MXU contraction per id family instead of serialized
    # scatter-adds (TPU lowers .at[idx].add to ~per-index ops; measured
    # ~1.7 ms for the two point scatters alone at production shapes).
    # All three payloads (Hpp 9, g_p 3, H_cp 18) are concatenated so the
    # (W, K, P) one-hot is contracted exactly once.
    Hpp, g_p, H_cp = _bin_landmark_blocks(
        problem.obs_pt_id, P,
        _einsum_hi("w k, w k i a, w k i b -> w k a b", w, Jp, Jp),
        _einsum_hi("w k, w k i a, w k i -> w k a", w, Jp, r),
        _einsum_hi("w k, w k i a, w k i b -> w k a b", w, Jc, Jp))

    Hqq = jnp.zeros((Q, 3, 3))
    g_q = jnp.zeros((Q, 3))
    H_cq = jnp.zeros((W, Q, 6, 3))
    for (ids_, ww, Jcx, Jpx, rx) in ((problem.obs_ln_sid, ws, Jcs, Jps, rs),
                                     (problem.obs_ln_eid, we, Jce, Jpe, re)):
        Hq1, gq1, Hcq1 = _bin_landmark_blocks(
            ids_, Q,
            _einsum_hi("w l, w l a, w l b -> w l a b", ww, Jpx, Jpx),
            _einsum_hi("w l, w l a, w l -> w l a", ww, Jpx, rx),
            _einsum_hi("w l, w l a, w l b -> w l a b", ww, Jcx, Jpx))
        Hqq, g_q, H_cq = Hqq + Hq1, g_q + gq1, H_cq + Hcq1

    # ---- damping + landmark inverse ------------------------------------
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + (lam * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-3
    ))[..., None] * eye3
    Hqq_d = Hqq + (lam * jnp.maximum(
        jnp.diagonal(Hqq, axis1=-2, axis2=-1), 1e-3
    ))[..., None] * eye3
    Hpp_inv = lie.inv3(Hpp_d)
    Hqq_inv = lie.inv3(Hqq_d)

    # ---- Schur reduction ----------------------------------------------
    Bp = _einsum_hi("w p a b, p b c -> w p a c", H_cp, Hpp_inv)
    Bq = _einsum_hi("w q a b, q b c -> w q a c", H_cq, Hqq_inv)
    S = (H_cc_block_diag(H_cc, W)
         - _einsum_hi("w p a b, v p c b -> w v a c", Bp, H_cp)
         - _einsum_hi("w q a b, v q c b -> w v a c", Bq, H_cq))
    g_red = (g_c - _einsum_hi("w p a b, p b -> w a", Bp, g_p)
             - _einsum_hi("w q a b, q b -> w a", Bq, g_q))

    # damping + pinning of fixed/invalid poses. LM damps the diagonal of
    # the ORIGINAL normal matrix (H_cc), not of the reduced S — that keeps
    # the Schur step exactly equal to the damped dense step.
    diag_idx = jnp.arange(W)
    damp = lam * jnp.maximum(jnp.diagonal(H_cc, axis1=-2, axis2=-1), 1e-3)
    S = S.at[diag_idx, diag_idx].add(
        damp[..., None] * jnp.eye(6) + 1e-6 * jnp.eye(6))
    # pin fixed/invalid poses AND free poses with no residual support:
    # a window KF whose observations were all detached (eviction,
    # fusion chains) has a ~zero normal block, so its step is fp noise
    # over the tiny damping floor — and since moving it is COST-
    # NEUTRAL, the LM accept guard cannot reject it when other poses'
    # steps reduce cost. Round-5 endurance runs measured such poses
    # compounding to ~4e5 m. No information => do not move (the same
    # rule as pose_graph.frozen_mask).
    support = jnp.diagonal(H_cc, axis1=-2, axis2=-1).sum(-1)    # (W,)
    pin = jnp.where(free & (support > 1.0), 0.0, pin_weight)
    S = S.at[diag_idx, diag_idx].add(pin[:, None, None] * jnp.eye(6))

    Sm = S.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
    gm = g_red.reshape(W * 6)
    dxi = -jnp.linalg.solve(Sm, gm).reshape(W, 6)
    dxi = jnp.where(free[:, None], dxi, 0.0)

    # ---- back-substitution ---------------------------------------------
    rhs_p = g_p + _einsum_hi("w p a b, w a -> p b", H_cp, dxi)
    d_pt = -_einsum_hi("p a b, p b -> p a", Hpp_inv, rhs_p)
    rhs_q = g_q + _einsum_hi("w q a b, w a -> q b", H_cq, dxi)
    d_ep = -_einsum_hi("q a b, q b -> q a", Hqq_inv, rhs_q)
    # only move landmarks with MEANINGFUL support: a weakly-observed
    # landmark (one grazing residual, trace ~1e-5) steps by
    # ~gradient/(lam*1e-3) — nearly cost-neutral, so the LM accept
    # guard lets it ride along with good steps and it random-walks to
    # absurd positions over many solves (round-5 endurance: landmarks
    # at 4e5 m). A genuinely observed landmark's J^T J trace is >> 1
    # (J ~ fx/z), so the 1e-4 floor only freezes the degenerate ones.
    d_pt = jnp.where((jnp.diagonal(Hpp, axis1=-2, axis2=-1).sum(-1)
                      > 1e-2)[:, None], d_pt, 0.0)
    d_ep = jnp.where((jnp.diagonal(Hqq, axis1=-2, axis2=-1).sum(-1)
                      > 1e-2)[:, None], d_ep, 0.0)
    return dxi, d_pt, d_ep


_MAX_POSE_STEP = 1.0      # twist-norm cap per LM iteration (m / rad)
_MAX_LM_STEP = 10.0       # landmark step cap per LM iteration (m)


def _cap_steps(dxi, d_pt, d_ep):
    """Per-variable trust-region caps (see run_lba.lm_iter): scale any
    pose twist above _MAX_POSE_STEP / landmark step above _MAX_LM_STEP
    down to the cap, direction preserved."""
    n = jnp.linalg.norm(dxi, axis=-1, keepdims=True)
    dxi = dxi * jnp.minimum(1.0, _MAX_POSE_STEP / jnp.maximum(n, 1e-12))
    np_ = jnp.linalg.norm(d_pt, axis=-1, keepdims=True)
    d_pt = d_pt * jnp.minimum(1.0, _MAX_LM_STEP / jnp.maximum(np_, 1e-12))
    ne = jnp.linalg.norm(d_ep, axis=-1, keepdims=True)
    d_ep = d_ep * jnp.minimum(1.0, _MAX_LM_STEP / jnp.maximum(ne, 1e-12))
    return dxi, d_pt, d_ep


def H_cc_block_diag(H_cc: jnp.ndarray, W: int) -> jnp.ndarray:
    """(W, 6, 6) per-pose blocks -> (W, W, 6, 6) block-diagonal tensor."""
    out = jnp.zeros((W, W, 6, 6))
    idx = jnp.arange(W)
    return out.at[idx, idx].set(H_cc)


@partial(jax.jit, static_argnames=("cfg",))
def run_lba(problem: LBAProblem, cam: StereoCamera, cfg: SlamConfig
            ) -> LBAResult:
    """Robust LM loop with accept/reject (levMarquardtOptimizationLBA)."""
    mcfg = cfg.mapping
    cost0 = lba_cost(problem, cam)

    def lm_iter(_, carry):
        prob, lam, cost = carry
        dxi, d_pt, d_ep = _assemble_and_solve(prob, cam, lam)
        # trust-region safeguard: with a SATURATING robust kernel, a
        # pose whose residuals are all outliers is cost-neutral to
        # move ANYWHERE (t-student cost is bounded at (dof+1) sigma^2
        # per residual no matter how absurd the pose), so an
        # ill-conditioned solve can propose a kilometre step that the
        # accept guard cannot reject — the round-5 endurance run
        # measured a window KF at 1e8 m through exactly this. Genuine
        # LBA corrections are sub-metre per LM iteration; the caps
        # leave them untouched (ceres-style step-length safeguard).
        dxi, d_pt, d_ep = _cap_steps(dxi, d_pt, d_ep)
        new_pose = jax.vmap(lambda d, T: lie.mm(lie.exp_se3(d), T))(dxi, prob.kf_pose)
        trial = prob._replace(kf_pose=new_pose,
                              pt_pos=prob.pt_pos + d_pt,
                              ep_pos=prob.ep_pos + d_ep)
        c_try = lba_cost(trial, cam)
        finite = (jnp.isfinite(c_try)
                  & jnp.all(jnp.isfinite(dxi))
                  & jnp.all(jnp.isfinite(d_pt))
                  & jnp.all(jnp.isfinite(d_ep)))
        accept = finite & (c_try < cost)
        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b) if a.ndim == 0 else
            jnp.where(jnp.reshape(accept, (1,) * a.ndim), a, b), trial, prob)
        lam_new = jnp.where(accept, lam * (1.0 / mcfg.lambda_factor),
                            lam * mcfg.lambda_factor)
        return prob, lam_new, jnp.where(accept, c_try, cost)

    problem1, _, cost1 = lax.fori_loop(
        0, mcfg.lba_iters, lm_iter,
        (problem, jnp.asarray(mcfg.lambda_init), cost0))

    pt_inl, ln_inl = posthoc_inliers(problem1, cam, cfg)
    return LBAResult(problem1.kf_pose, problem1.pt_pos, problem1.ep_pos,
                     cost0, cost1, pt_inl, ln_inl)


def posthoc_inliers(problem1: LBAProblem, cam: StereoCamera,
                    cfg: SlamConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Post-hoc outlier flags at the solved state (markers, not
    re-solve) — also used by the distributed solve, which computes its
    flags on the full layout after gathering the sharded solution."""
    mcfg = cfg.mapping
    r, _, _, ok = _point_rj(problem1.kf_pose, problem1.pt_pos,
                            problem1.obs_pt_uv, problem1.obs_pt_disp,
                            problem1.obs_pt_id, cam)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    rs, _, _, oks = _endpoint_rj(problem1.kf_pose, problem1.ep_pos,
                                 problem1.obs_ln_le, problem1.obs_ln_sid, cam)
    re, _, _, oke = _endpoint_rj(problem1.kf_pose, problem1.ep_pos,
                                 problem1.obs_ln_le, problem1.obs_ln_eid, cam)
    # gate sigma floored at the detector's pixel noise: on near-perfect
    # data MAD collapses toward 0 and an unfloored k*sigma gate would
    # flag EVERY observation as an outlier (detaching the whole map)
    sigma = jnp.maximum(_robust_sigma(rn, ok, rs, oks, re, oke),
                        mcfg.lba_min_sigma)
    k = mcfg.lba_inlier_k
    pt_inl = ok & (rn < k * sigma)
    ln_inl = oks & oke & (jnp.abs(rs) < k * sigma) & (jnp.abs(re) < k * sigma)
    return pt_inl, ln_inl
