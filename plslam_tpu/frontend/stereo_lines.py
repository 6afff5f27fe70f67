"""Line front-end: detection, LBD description, stereo matching.

Reference parity: stvo-pl ``src/stereoFrame.cpp`` —
``detectLineFeatures`` (LSD + LBD) and ``matchStereoLines`` (LBD NN +
angular consistency + segment y-overlap + per-endpoint disparity by
intersecting the right line with the left endpoints' epipolar rows,
then back-projection of both endpoints).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineObservations, line_equation
from plslam_tpu.ops import hamming, lbd, lines
from plslam_tpu.ops.gather import take_mxu
from plslam_tpu.ops.image import sobel_gradients


def detect_and_describe_lines(img: jnp.ndarray, cfg: SlamConfig
                              ) -> Tuple[lines.Segments, jnp.ndarray]:
    l = cfg.lines
    H, W = img.shape
    diag = (H * H + W * W) ** 0.5
    if l.use_fld_lines:
        # FLD-equivalent operating point (stvo-pl config.h use_fld_lines):
        # the reference swaps LSD for the faster, coarser FLD; here the
        # same tile detector runs on a 2x-downsampled image (4x fewer
        # tiles + 4x cheaper gradients), endpoints scaled back up. LBD
        # still samples the full-resolution gradients.
        from plslam_tpu.ops.image import resize_bilinear
        small = resize_bilinear(img, (H // 2, W // 2))
        # gates retuned for half-res evidence: gradient mass per tile
        # halves and thin ridges blur, so support/elongation thresholds
        # drop by the configured fld_*_scale factors (validated on
        # synthetic ground-truth scenes)
        segs = lines.detect_segments(
            small, max_lines=l.max_lines, tile=l.tile,
            grad_th=l.grad_th / 255.0 * 0.5,
            min_support=l.min_support * l.fld_support_scale,
            elong_th=l.elong_th * l.fld_elong_scale,
            perp_spread_th=l.perp_spread_th, coherence_th=l.coherence_th,
            merge_iters=max(l.merge_iters * 3, 8),
            merge_ang_th=l.merge_ang_th, merge_dist_th=l.merge_dist_th,
            merge_gap_th=l.merge_gap_th * l.fld_gap_scale,
            min_length=l.min_line_length * diag * 0.5)
        segs = segs._replace(sp=segs.sp * 2.0, ep=segs.ep * 2.0)
    else:
        segs = lines.detect_segments(
            img, max_lines=l.max_lines, tile=l.tile,
            grad_th=l.grad_th / 255.0,
            min_support=l.min_support, elong_th=l.elong_th,
            perp_spread_th=l.perp_spread_th, coherence_th=l.coherence_th,
            merge_iters=max(l.merge_iters * 3, 8),
            merge_ang_th=l.merge_ang_th, merge_dist_th=l.merge_dist_th,
            merge_gap_th=l.merge_gap_th,
            min_length=l.min_line_length * diag)
        if l.scale_levels > 1:
            # scale-space detection (LSDDetector::detect pyramid parity):
            # a second pass on the half-res image catches long blurred /
            # low-contrast structures whose gradients are too diffuse to
            # cohere at full resolution; the two sets fuse by collinear
            # merge, so a line found at both scales survives once
            from plslam_tpu.ops.image import resize_bilinear
            small = resize_bilinear(img, (H // 2, W // 2))
            coarse = lines.detect_segments(
                small, max_lines=l.max_lines, tile=l.tile,
                grad_th=l.grad_th / 255.0 * 0.5,
                min_support=l.min_support * l.fld_support_scale,
                elong_th=l.elong_th * l.fld_elong_scale,
                perp_spread_th=l.perp_spread_th,
                coherence_th=l.coherence_th,
                merge_iters=max(l.merge_iters * 3, 8),
                merge_ang_th=l.merge_ang_th, merge_dist_th=l.merge_dist_th,
                merge_gap_th=l.merge_gap_th * l.fld_gap_scale,
                min_length=l.min_line_length * diag * 0.5)
            coarse = coarse._replace(sp=coarse.sp * 2.0, ep=coarse.ep * 2.0)
            segs = _fuse_levels(segs, coarse, l)
    if l.lbd_half_res:
        from plslam_tpu.ops.image import resize_bilinear
        small = resize_bilinear(img, (H // 2, W // 2))
        gx, gy = sobel_gradients(small)
        desc = lbd.describe_lines(small, segs.sp * 0.5, segs.ep * 0.5,
                                  n_bands=l.lbd_bands,
                                  band_width=max(l.lbd_band_width // 2, 3),
                                  n_samples=l.lbd_samples,
                                  samples_per_band=l.lbd_band_samples,
                                  gx=gx, gy=gy)
    else:
        gx, gy = sobel_gradients(img)
        desc = lbd.describe_lines(img, segs.sp, segs.ep, n_bands=l.lbd_bands,
                                  band_width=l.lbd_band_width,
                                  n_samples=l.lbd_samples,
                                  samples_per_band=l.lbd_band_samples,
                                  gx=gx, gy=gy)
    return segs, desc


def _fuse_levels(fine: lines.Segments, coarse: lines.Segments,
                 l) -> lines.Segments:
    """Fuse two pyramid levels: the fine level keeps its (precise)
    endpoints; a coarse segment is ADDED only where no collinear
    overlapping fine segment already covers it — the pyramid's job is
    recall on structures the full-res pass misses, not re-estimating
    ones it found."""
    # coarse i covered by fine j: similar angle, small perpendicular
    # offset, and overlapping projection intervals on coarse's direction
    dang = jnp.abs(coarse.angle[:, None] - fine.angle[None, :])
    dang = jnp.minimum(dang, jnp.pi - dang)
    dc = coarse.ep - coarse.sp
    length_c = jnp.maximum(jnp.linalg.norm(dc, axis=-1), 1e-6)
    u = dc / length_c[:, None]
    nrm = jnp.stack([-u[:, 1], u[:, 0]], axis=-1)
    mid_c = 0.5 * (coarse.sp + coarse.ep)
    mid_f = 0.5 * (fine.sp + fine.ep)
    rel = mid_f[None, :, :] - mid_c[:, None, :]
    off = jnp.abs(jnp.einsum("ik,ijk->ij", nrm, rel))
    proj = jnp.einsum("ik,ijk->ij", u, rel)
    len_f = jnp.linalg.norm(fine.ep - fine.sp, axis=-1)
    overlap = (jnp.abs(proj)
               < 0.5 * (length_c[:, None] + len_f[None, :]))
    covered = jnp.any((dang < 2 * l.merge_ang_th)
                      & (off < 2.5 * l.merge_dist_th) & overlap
                      & fine.valid[None, :], axis=1)
    keep_c = coarse.valid & ~covered
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    # half-res support mass counts ~1/4 the pixels; rescale for ranking
    score = cat(jnp.where(fine.valid, fine.score, -1.0),
                jnp.where(keep_c, 4.0 * coarse.score, -1.0))
    top = jax.lax.top_k(score, l.max_lines)[1]
    sp = cat(fine.sp, coarse.sp)[top]
    ep = cat(fine.ep, coarse.ep)[top]
    ang = cat(fine.angle, coarse.angle)[top]
    sc = score[top]
    return lines.Segments(sp=sp, ep=ep, angle=ang,
                          score=jnp.maximum(sc, 0.0), valid=sc > 0)


def seg_y_overlap(sp_a, ep_a, sp_b, ep_b) -> jnp.ndarray:
    """(N,2)x(M,2) -> (N, M) vertical overlap ratio of segments (the
    reference's stereo overlap test works on rectified rows)."""
    alo = jnp.minimum(sp_a[:, 1], ep_a[:, 1])[:, None]
    ahi = jnp.maximum(sp_a[:, 1], ep_a[:, 1])[:, None]
    blo = jnp.minimum(sp_b[:, 1], ep_b[:, 1])[None, :]
    bhi = jnp.maximum(sp_b[:, 1], ep_b[:, 1])[None, :]
    inter = jnp.maximum(jnp.minimum(ahi, bhi) - jnp.maximum(alo, blo), 0.0)
    denom = jnp.maximum(jnp.minimum(ahi - alo, bhi - blo), 1e-6)
    return inter / denom


def match_stereo_lines(segs_l: lines.Segments, desc_l: jnp.ndarray,
                       segs_r: lines.Segments, desc_r: jnp.ndarray,
                       cam: StereoCamera, cfg: SlamConfig
                       ) -> LineObservations:
    m = cfg.matching
    dist = hamming.hamming_matrix(desc_l, desc_r, segs_l.valid, segs_r.valid,
                                  bf16=cfg.system.bf16_matching)
    dang = jnp.abs(segs_l.angle[:, None] - segs_r.angle[None, :])
    dang = jnp.minimum(dang, jnp.pi - dang)
    ov = seg_y_overlap(segs_l.sp, segs_l.ep, segs_r.sp, segs_r.ep)
    # near-horizontal lines have no stereo information on rectified pairs
    not_horiz = jnp.abs(
        jnp.mod(segs_l.angle + jnp.pi / 2, jnp.pi) - jnp.pi / 2
    ) > m.line_horiz_th
    mask = (dang < 0.3) & (ov > m.stereo_overlap_th) & not_horiz[:, None]
    res = hamming.match_nnr(hamming.apply_mask(dist, mask), m.max_hamming_l,
                            m.min_ratio_12_l, mutual=m.best_lr_matches)

    idx = jnp.maximum(res.idx, 0)
    # right line equation; intersect with the left endpoints' rows
    # (one widened MXU gather of both endpoints)
    rsel = take_mxu(jnp.concatenate([segs_r.sp, segs_r.ep], axis=-1), idx)
    le_r = line_equation(rsel[:, :2], rsel[:, 2:])
    def row_intersect(pt):
        # u on the right line at row v = pt[:,1]: a u + b v + c = 0
        a, b, c = le_r[:, 0], le_r[:, 1], le_r[:, 2]
        safe_a = jnp.where(jnp.abs(a) < 1e-6, 1e-6, a)
        return -(b * pt[:, 1] + c) / safe_a

    u_rs = row_intersect(segs_l.sp)
    u_re = row_intersect(segs_l.ep)
    sdisp = segs_l.sp[:, 0] - u_rs
    edisp = segs_l.ep[:, 0] - u_re
    disp_ok = ((sdisp > m.min_disp) & (sdisp < m.max_disp)
               & (edisp > m.min_disp) & (edisp < m.max_disp))
    valid = res.valid & segs_l.valid & disp_ok

    sP = cam.back_project(segs_l.sp, jnp.where(valid, sdisp, 1.0))
    eP = cam.back_project(segs_l.ep, jnp.where(valid, edisp, 1.0))
    le = line_equation(segs_l.sp, segs_l.ep)
    return LineObservations(
        sp=segs_l.sp, ep=segs_l.ep, le=le, angle=segs_l.angle,
        sdisp=sdisp, edisp=edisp, sP=sP, eP=eP, desc=desc_l,
        score=segs_l.score, valid=valid)
