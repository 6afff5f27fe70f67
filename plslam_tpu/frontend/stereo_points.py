"""Point front-end: multi-scale detection, description, stereo matching.

Reference parity: stvo-pl ``src/stereoFrame.cpp`` —
``detectPointFeatures`` (ORB pyramid detect+describe) and
``matchStereoPoints`` (rectified-row Hamming NN + ratio + min disparity,
then back-projection to 3D). The reference runs left/right in two
std::threads (``lr_in_parallel``); here both eyes batch through the same
fused program. The grid search structure becomes arithmetic masks on the
full MXU distance matrix.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.ops.gather import take_mxu
from plslam_tpu.frontend.features import PointObservations
from plslam_tpu.ops import fast, hamming, orb
from plslam_tpu.ops.image import build_pyramid


def _level_capacities(total: int, n_levels: int, scale: float) -> List[int]:
    """Static per-level detection capacities, proportional to level area."""
    w = np.array([(1.0 / scale**2) ** i for i in range(n_levels)])
    caps = np.maximum((w / w.sum() * total).astype(int), 16)
    return [int(c) for c in caps]


def detect_and_describe(img: jnp.ndarray, cfg: SlamConfig
                        ) -> Tuple[jnp.ndarray, ...]:
    """Monocular ORB stage on one image.

    Returns (uv (K,2) level-0 coords, desc (K,256), octave (K,), angle (K,),
    score (K,), valid (K,)) with K = cfg.points.max_kpts.
    """
    p = cfg.points
    levels = build_pyramid(img, p.orb_nlevels, p.orb_scale_factor)
    caps = _level_capacities(2 * p.max_kpts, p.orb_nlevels, p.orb_scale_factor)
    uvs_lvl, octs, scores, valids = [], [], [], []
    for i, lvl in enumerate(levels):
        uv_i, s_i, v_i = fast.detect_fast(
            lvl, caps[i], th=p.fast_th / 255.0, th_min=p.fast_min_th / 255.0,
            adaptive=p.adaptative_fast, nms_radius=p.nms_radius,
            grid_rows=p.grid_rows, grid_cols=p.grid_cols,
            border=orb.PATCH_HALF + 1)
        scale = p.orb_scale_factor ** i
        uvs_lvl.append(uv_i)                     # level-local coords
        octs.append(jnp.full((caps[i],), i, jnp.int32))
        # slight preference for finer levels on ties
        scores.append(jnp.where(v_i, s_i, -jnp.inf) * (1.0 / scale))
        valids.append(v_i)
    uv_lvl = jnp.concatenate(uvs_lvl)
    octave = jnp.concatenate(octs)
    score = jnp.concatenate(scores)
    valid = jnp.concatenate(valids)
    # global top-K across levels FIRST; only the K winners get described
    # (the candidate pool is 2x oversized — describing it all would double
    # the descriptor gather, the most expensive part of this stage)
    k = p.max_kpts
    top_s, top_i = jax.lax.top_k(score, k)
    # one widened MXU gather for all per-winner attributes (serialized
    # row gathers are the TPU slow path — see ops/gather.py)
    payload = jnp.concatenate(
        [uv_lvl, octave[:, None].astype(jnp.float32),
         valid[:, None].astype(jnp.float32)], axis=-1)
    sel = take_mxu(payload, top_i)
    uv_sel = sel[:, :2]
    oct_sel = sel[:, 2].astype(jnp.int32)
    desc, angle = orb.describe_multilevel(levels, uv_sel, oct_sel)
    scale_tab = jnp.asarray([p.orb_scale_factor ** i
                             for i in range(p.orb_nlevels)], jnp.float32)
    uv0 = uv_sel * jnp.take(scale_tab, oct_sel)[:, None]
    return (uv0, desc, oct_sel, angle,
            jnp.where(jnp.isfinite(top_s), top_s, 0.0),
            (sel[:, 3] > 0.5) & jnp.isfinite(top_s))


def match_stereo_points(uv_l, desc_l, oct_l, valid_l,
                        uv_r, desc_r, oct_r, valid_r,
                        cfg: SlamConfig) -> hamming.MatchResult:
    """Rectified stereo correspondence (matchStereoPoints parity):
    same-row window, disparity in [min_disp, max_disp], same octave,
    Hamming NN + Lowe ratio + mutual best."""
    m = cfg.matching
    dist = hamming.hamming_matrix(desc_l, desc_r, valid_l, valid_r,
                                  bf16=cfg.system.bf16_matching)
    row_ok = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1]) <= m.stereo_row_tol
    d = uv_l[:, None, 0] - uv_r[None, :, 0]
    disp_ok = (d >= m.min_disp) & (d <= m.max_disp)
    oct_ok = jnp.abs(oct_l[:, None] - oct_r[None, :]) <= 1
    dist = hamming.apply_mask(dist, row_ok & disp_ok & oct_ok)
    return hamming.match_nnr(dist, m.max_hamming_p, m.min_ratio_12_p,
                             mutual=m.best_lr_matches)


@partial(jax.jit, static_argnames=("cfg",))
def extract_stereo_points(img_l: jnp.ndarray, img_r: jnp.ndarray,
                          cam: StereoCamera, cfg: SlamConfig
                          ) -> PointObservations:
    """Full stereo point front-end for one frame, one fused program.

    Left/right run as a batch of 2 through the same vmapped detector
    (the reference's ``lr_in_parallel`` std::threads, SURVEY.md §2.3 P2).
    """
    both = jnp.stack([img_l, img_r])
    uv, desc, octv, ang, sc, val = jax.vmap(
        lambda im: detect_and_describe(im, cfg))(both)
    uv_l, desc_l, oct_l, ang_l, sc_l, val_l = (
        uv[0], desc[0], octv[0], ang[0], sc[0], val[0])
    uv_r, desc_r, oct_r, ang_r, sc_r, val_r = (
        uv[1], desc[1], octv[1], ang[1], sc[1], val[1])
    mres = match_stereo_points(uv_l, desc_l, oct_l, val_l,
                               uv_r, desc_r, oct_r, val_r, cfg)
    idx = jnp.maximum(mres.idx, 0)
    uv_rm = take_mxu(uv_r, idx)
    disp = uv_l[:, 0] - uv_rm[:, 0]
    valid = mres.valid & val_l & (disp > cfg.matching.min_disp)
    P = cam.back_project(uv_l, jnp.where(valid, disp, 1.0))
    return PointObservations(
        uv=uv_l, uv_r=uv_rm, disp=disp, P=P, desc=desc_l, octave=oct_l,
        angle=ang_l, score=sc_l, valid=valid)
