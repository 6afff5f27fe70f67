"""Robust Gauss-Newton SE(3) pose optimization over point + line residuals.

Reference parity: stvo-pl ``src/stereoFrameHandler.cpp`` —
``optimizePose``, ``gaussNewtonOptimization``,
``levenbergMarquardtOptimization``, ``removeOutliers`` and the
residual/Jacobian assembly. The math is identical (point reprojection
2-residuals; line point-to-line 2-residuals per segment from both
projected endpoints; t-student robust weights on MAD-scaled residual
norms); the execution model is TPU-shaped: fixed-capacity masked
arrays, fixed iteration counts via ``lax.fori_loop``, the 6x6 normal
equations assembled as one batched matmul, no data-dependent branching.

Residual/Jacobian conventions (left-multiplicative perturbation,
twist ordering (v, w) as in core.lie):
  point:  r = pi(T P) - uv_obs                       (2 scalars)
          dr/dxi = dpi/dPc @ [ I  -skew(Pc) ]        (2x6)
  line:   r_s = le . (u_s, v_s, 1),  r_e likewise    (2 scalars)
          dr_s/dxi = le_xy^T @ dpi/dPc @ [I -skew]   (1x6)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie, robust
from plslam_tpu.core.camera import StereoCamera


class PointTerms(NamedTuple):
    """Matched f2f point terms: previous-frame 3D vs current observation."""
    P: jnp.ndarray         # (K, 3) 3D in previous frame
    uv_obs: jnp.ndarray    # (K, 2) observed pixel in current frame
    valid: jnp.ndarray     # (K,) bool


class LineTerms(NamedTuple):
    """Matched f2f line terms: previous 3D endpoints vs current 2D line."""
    sP: jnp.ndarray        # (L, 3)
    eP: jnp.ndarray        # (L, 3)
    le_obs: jnp.ndarray    # (L, 3) normalized observed line equation
    valid: jnp.ndarray     # (L,) bool


class PoseResult(NamedTuple):
    T: jnp.ndarray          # (4, 4) optimized relative pose
    cov: jnp.ndarray        # (6, 6) pose covariance
    n_inliers: jnp.ndarray  # () int32 (points + line endpoints / 2)
    err: jnp.ndarray        # () float32 robust RMS residual of inliers
    inlier_pt: jnp.ndarray  # (K,) bool
    inlier_ln: jnp.ndarray  # (L,) bool
    good: jnp.ndarray       # () bool — isGoodSolution gates


def _se3_point_jacobian(cam: StereoCamera, Pc: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) transformed points -> (N, 2, 6) d(pixel)/d(twist)."""
    Jproj = cam.project_jacobian(Pc)                    # (N, 2, 3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=Pc.dtype), Pc.shape[:-1] + (3, 3))
    Jse3 = jnp.concatenate([I, -lie.skew(Pc)], axis=-1)  # (N, 3, 6)
    return lie.mm(Jproj, Jse3)


def point_terms_rj(T: jnp.ndarray, cam: StereoCamera, terms: PointTerms
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> residuals (K, 2), jacobians (K, 2, 6), per-feature norm (K,)."""
    Pc = lie.transform_points(T, terms.P)
    behind = Pc[..., 2] < 0.1
    r = cam.project(Pc) - terms.uv_obs
    J = _se3_point_jacobian(cam, Pc)
    ok = terms.valid & ~behind
    r = jnp.where(ok[:, None], r, 0.0)
    J = jnp.where(ok[:, None, None], J, 0.0)
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return r, J, norm


def line_terms_rj(T: jnp.ndarray, cam: StereoCamera, terms: LineTerms
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> residuals (L, 2), jacobians (L, 2, 6), per-endpoint |r| (L, 2)."""
    def endpoint(P3):
        Pc = lie.transform_points(T, P3)
        uv = cam.project(Pc)
        r = (terms.le_obs[:, 0] * uv[:, 0] + terms.le_obs[:, 1] * uv[:, 1]
             + terms.le_obs[:, 2])
        Jpix = _se3_point_jacobian(cam, Pc)             # (L, 2, 6)
        J = jnp.einsum("l i, l i j -> l j", terms.le_obs[:, :2], Jpix,
                       precision=lax.Precision.HIGHEST)
        return r, J, Pc[..., 2] < 0.1

    r_s, J_s, bs = endpoint(terms.sP)
    r_e, J_e, be = endpoint(terms.eP)
    ok = terms.valid & ~bs & ~be
    r = jnp.where(ok[:, None], jnp.stack([r_s, r_e], axis=-1), 0.0)
    J = jnp.where(ok[:, None, None], jnp.stack([J_s, J_e], axis=-2), 0.0)
    return r, J, jnp.abs(r)


def _assemble_normal_eqs(r_pt, J_pt, w_pt, r_ln, J_ln, w_ln):
    """Weighted 6x6 H and 6 g from point (K,2[,6]) and line (L,2[,6]) terms.

    One einsum each — XLA lowers these to MXU matmuls over the stacked
    residual axis (the reference's per-feature accumulation loop).
    """
    hi = lax.Precision.HIGHEST  # bf16 normal equations skew the solve
    H = (jnp.einsum("k, k i p, k i q -> p q", w_pt, J_pt, J_pt, precision=hi)
         + jnp.einsum("l i, l i p, l i q -> p q", w_ln, J_ln, J_ln,
                      precision=hi))
    g = (jnp.einsum("k, k i p, k i -> p", w_pt, J_pt, r_pt, precision=hi)
         + jnp.einsum("l i, l i p, l i -> p", w_ln, J_ln, r_ln, precision=hi))
    return H, g


def _weights(norm_pt, valid_pt, abs_ln, valid_ln):
    """Robust per-term weights from a joint MAD scale (removes the
    point/line unit mismatch exactly like the reference's per-family
    normalization)."""
    all_norms = jnp.concatenate([norm_pt, abs_ln.reshape(-1)])
    all_valid = jnp.concatenate([valid_pt, jnp.repeat(valid_ln, 2)])
    sigma = robust.mad_scale_zero_centered(all_norms, all_valid)
    w_pt = jnp.where(valid_pt, robust.tstudent_weight(norm_pt, sigma), 0.0)
    w_ln = jnp.where(valid_ln[:, None],
                     robust.tstudent_weight(abs_ln, sigma), 0.0)
    return w_pt, w_ln, sigma


def optimize_pose(T0: jnp.ndarray, cam: StereoCamera, pts: PointTerms,
                  lns: Optional[LineTerms], cfg: SlamConfig) -> PoseResult:
    """optimizePose parity: robust GN -> outlier cut -> refinement -> gates.

    Fixed-shape, jittable. ``lns`` may be a zero-capacity LineTerms for
    the point-only configuration.
    """
    tcfg = cfg.tracking
    if lns is None:
        z = jnp.zeros((0, 3))
        lns = LineTerms(z, z, z, jnp.zeros((0,), bool))

    damp = 1e-6  # tiny Tikhonov term: GN solve stays defined when rank-deficient

    def gn_iter(_, carry):
        T, pt_mask, ln_mask = carry
        r_pt, J_pt, n_pt = point_terms_rj(T, cam, pts._replace(valid=pt_mask))
        r_ln, J_ln, a_ln = line_terms_rj(T, cam, lns._replace(valid=ln_mask))
        w_pt, w_ln, _ = _weights(n_pt, pt_mask, a_ln, ln_mask)
        H, g = _assemble_normal_eqs(r_pt, J_pt, w_pt, r_ln, J_ln, w_ln)
        dxi = -jnp.linalg.solve(H + damp * jnp.eye(6), g)
        # guard: keep the pose unchanged if the solve exploded
        ok = jnp.all(jnp.isfinite(dxi))
        T_new = jnp.where(ok, lie.mm(lie.exp_se3(dxi), T), T)
        return T_new, pt_mask, ln_mask

    # main robust GN on all matches
    T1, _, _ = lax.fori_loop(0, tcfg.max_iters,
                             gn_iter, (T0, pts.valid, lns.valid))

    # removeOutliers parity: gate on robust scale of residual norms.
    # The scale is floored at a quarter pixel — on near-noise-free data
    # MAD collapses toward zero and k*sigma would reject perfectly
    # fitting features.
    _, _, n_pt = point_terms_rj(T1, cam, pts)
    _, _, a_ln = line_terms_rj(T1, cam, lns)
    all_norms = jnp.concatenate([n_pt, a_ln.reshape(-1)])
    all_valid = jnp.concatenate([pts.valid, jnp.repeat(lns.valid, 2)])
    sigma = jnp.maximum(
        robust.mad_scale_zero_centered(all_norms, all_valid), 0.25)
    inlier_pt = pts.valid & (n_pt < tcfg.inlier_k * sigma)
    inlier_ln = lns.valid & jnp.all(a_ln < tcfg.inlier_k * sigma, axis=-1)

    # refinement pass on inliers only
    T2, _, _ = lax.fori_loop(0, tcfg.max_iters_ref,
                             gn_iter, (T1, inlier_pt, inlier_ln))

    # final statistics, covariance, gates (isGoodSolution parity)
    r_pt, J_pt, n_pt = point_terms_rj(T2, cam, pts._replace(valid=inlier_pt))
    r_ln, J_ln, a_ln = line_terms_rj(T2, cam, lns._replace(valid=inlier_ln))
    w_pt, w_ln, _ = _weights(n_pt, inlier_pt, a_ln, inlier_ln)
    H, _ = _assemble_normal_eqs(r_pt, J_pt, w_pt, r_ln, J_ln, w_ln)
    n_res = 2.0 * (jnp.sum(inlier_pt) + jnp.sum(inlier_ln))
    sse = (jnp.sum(w_pt * n_pt ** 2) + jnp.sum(w_ln * a_ln ** 2))
    sigma2 = sse / jnp.maximum(n_res - 6.0, 1.0)
    cov = sigma2 * jnp.linalg.inv(H + damp * jnp.eye(6))
    err = jnp.sqrt(sse / jnp.maximum(n_res, 1.0))

    n_inl = (jnp.sum(inlier_pt) + jnp.sum(inlier_ln)).astype(jnp.int32)
    n_total = jnp.maximum(jnp.sum(pts.valid) + jnp.sum(lns.valid), 1)
    good = ((n_inl >= tcfg.min_features)
            & (n_inl >= tcfg.min_inlier_ratio * n_total)
            & (err < tcfg.max_optim_error)
            & jnp.all(jnp.isfinite(T2))
            & lie.is_valid_rotation(T2[:3, :3]))
    return PoseResult(T2, cov, n_inl, err, inlier_pt, inlier_ln, good)


def optimize_pose_lm(T0: jnp.ndarray, cam: StereoCamera, pts: PointTerms,
                     lns: Optional[LineTerms], cfg: SlamConfig) -> PoseResult:
    """levenbergMarquardtOptimization parity: adaptive damping with
    accept/reject steps, used as the fallback for ill-conditioned frames.
    Same residual machinery; fixed iteration count with masked accept."""
    tcfg = cfg.tracking
    if lns is None:
        z = jnp.zeros((0, 3))
        lns = LineTerms(z, z, z, jnp.zeros((0,), bool))

    def cost(T):
        _, _, n_pt = point_terms_rj(T, cam, pts)
        _, _, a_ln = line_terms_rj(T, cam, lns)
        w_pt, w_ln, _ = _weights(n_pt, pts.valid, a_ln, lns.valid)
        return jnp.sum(w_pt * n_pt ** 2) + jnp.sum(w_ln * a_ln ** 2)

    def lm_iter(_, carry):
        T, lam, c = carry
        r_pt, J_pt, n_pt = point_terms_rj(T, cam, pts)
        r_ln, J_ln, a_ln = line_terms_rj(T, cam, lns)
        w_pt, w_ln, _ = _weights(n_pt, pts.valid, a_ln, lns.valid)
        H, g = _assemble_normal_eqs(r_pt, J_pt, w_pt, r_ln, J_ln, w_ln)
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(6)
        dxi = -jnp.linalg.solve(Hd, g)
        T_try = lie.mm(lie.exp_se3(dxi), T)
        c_try = cost(T_try)
        accept = jnp.isfinite(c_try) & (c_try < c)
        T_new = jnp.where(accept, T_try, T)
        lam_new = jnp.where(accept, lam * 0.33, lam * 3.0)
        return T_new, lam_new, jnp.where(accept, c_try, c)

    c0 = cost(T0)
    T1, _, _ = lax.fori_loop(0, 2 * tcfg.max_iters, lm_iter,
                             (T0, jnp.asarray(tcfg.lm_init_lambda), c0))
    # share the outlier/refine/gate tail with the GN path
    res = optimize_pose(T1, cam, pts, lns,
                        cfg.with_updates({"tracking": {"max_iters": 1}}))
    return res
