"""Joint stereo frame extraction: points + lines in one program.

Reference parity: stvo-pl ``src/stereoFrame.cpp ::
extractStereoFeatures`` — the top of the per-frame call stack
(SURVEY.md §3.2). The reference parallelizes point-vs-line detection
and left-vs-right with std::threads (``pl_in_parallel`` /
``lr_in_parallel``); here both feature families and both eyes live in
ONE jitted program, so XLA overlaps them on the chip (SURVEY.md §2.3
P1/P2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineObservations, PointObservations
from plslam_tpu.frontend.stereo_points import (detect_and_describe,
                                               match_stereo_points)
from plslam_tpu.frontend.stereo_lines import (detect_and_describe_lines,
                                              match_stereo_lines)


@partial(jax.jit, static_argnames=("cfg",))
def extract_stereo_frame(img_l: jnp.ndarray, img_r: jnp.ndarray,
                         cam: StereoCamera, cfg: SlamConfig
                         ) -> Tuple[PointObservations, Optional[LineObservations]]:
    """Full front-end for one rectified stereo pair."""
    pts = None
    lns = None
    both = jnp.stack([img_l, img_r])
    if not cfg.points.has_points:
        # lines-only configuration (reference: has_points=false): a
        # zero-capacity point set keeps every downstream shape static
        z2 = jnp.zeros((0, 2))
        pts = PointObservations(
            uv=z2, uv_r=z2, disp=jnp.zeros((0,)), P=jnp.zeros((0, 3)),
            desc=jnp.zeros((0, 256), jnp.uint8),
            octave=jnp.zeros((0,), jnp.int32), angle=jnp.zeros((0,)),
            score=jnp.zeros((0,)), valid=jnp.zeros((0,), bool))
    if cfg.points.has_points:
        uv, desc, octv, ang, sc, val = jax.vmap(
            lambda im: detect_and_describe(im, cfg))(both)
        uv_l, desc_l, oct_l, ang_l, sc_l, val_l = (
            uv[0], desc[0], octv[0], ang[0], sc[0], val[0])
        uv_r, desc_r, oct_r, val_r = uv[1], desc[1], octv[1], val[1]
        mres = match_stereo_points(uv_l, desc_l, oct_l, val_l,
                                   uv_r, desc_r, oct_r, val_r, cfg)
        idx = jnp.maximum(mres.idx, 0)
        uv_rm = jnp.take(uv_r, idx, axis=0)
        disp = uv_l[:, 0] - uv_rm[:, 0]
        valid = mres.valid & val_l & (disp > cfg.matching.min_disp)
        P = cam.back_project(uv_l, jnp.where(valid, disp, 1.0))
        pts = PointObservations(uv=uv_l, uv_r=uv_rm, disp=disp, P=P,
                                desc=desc_l, octave=oct_l, angle=ang_l,
                                score=sc_l, valid=valid)
    if cfg.lines.has_lines:
        segs, d = jax.vmap(lambda im: detect_and_describe_lines(im, cfg))(both)
        segs_l = jax.tree_util.tree_map(lambda x: x[0], segs)
        segs_r = jax.tree_util.tree_map(lambda x: x[1], segs)
        lns = match_stereo_lines(segs_l, d[0], segs_r, d[1], cam, cfg)
    return pts, lns


def make_extractor(cam: StereoCamera, cfg: SlamConfig):
    """Extractor closure for the StereoVO / SLAM drivers."""
    def fn(img_l, img_r):
        return extract_stereo_frame(img_l, img_r, cam, cfg)
    return fn
