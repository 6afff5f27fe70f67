"""Chunked stereo VO: many frames per jitted dispatch.

The per-frame driver (tracking.frame_handler.StereoVO) dispatches two
programs per frame; on deployment rigs where program launch has real
latency (remote TPU runtimes; measured ~20 ms/dispatch on this one),
throughput is launch-bound long before the chip is busy. This module is
the throughput mode: a chunk of B stereo pairs is feature-extracted as
one batch (bigger matmuls, better MXU utilization) and the sequential
frame-to-frame tracking recurrence runs as a ``lax.scan`` INSIDE the
same program — one dispatch per B frames, device-bound throughput.

The reference has no equivalent (it is synchronous per-frame); this is
part of the new TPU scaling story, alongside parallel/dist_lba.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineObservations, PointObservations
from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
from plslam_tpu.tracking import pose_gn
from plslam_tpu.tracking.frame_handler import (build_line_terms,
                                               build_point_terms,
                                               match_f2f_lines,
                                               match_f2f_points)


class ChunkOutput(NamedTuple):
    DT: jnp.ndarray          # (B, 4, 4) relative pose prev->cur per frame
    cov: jnp.ndarray         # (B, 6, 6)
    n_inliers: jnp.ndarray   # (B,)
    err: jnp.ndarray         # (B,)
    good: jnp.ndarray        # (B,)
    last_pts: PointObservations             # final frame's features (carry out)
    last_lns: Optional[LineObservations]
    DT_next: jnp.ndarray = None  # (4, 4) next chunk's constant-velocity
                                 # prior (last good step), computed in-
                                 # program so the driver needs no extra
                                 # per-chunk dispatch
    all_pts: Optional[PointObservations] = None   # (B, ...) per-frame feats
    all_lns: Optional[LineObservations] = None    # (keep_feats mode, device-
                                                  #  resident; the SLAM driver
                                                  #  slices KFs out of them)


@partial(jax.jit, static_argnames=("cfg", "keep_feats"))
def vo_chunk(imgs_l: jnp.ndarray, imgs_r: jnp.ndarray,
             prev_pts: PointObservations,
             prev_lns: Optional[LineObservations],
             T_prior0: jnp.ndarray,
             cam: StereoCamera, cfg: SlamConfig,
             keep_feats: bool = False) -> ChunkOutput:
    """Process (B, H, W) stereo chunks in one program.

    Extraction (points + lines when ``cfg.lines.has_lines``) is batched
    over frames; the tracking recurrence (constant-velocity prior
    threading + joint robust GN) runs fully BATCHED over the frame pairs
    (``tracking.batched_chunks``, default) or as a sequential lax.scan.

    The batched mode exploits that consecutive-pair tracking decouples
    given a prior: pass 1 matches + solves every pair from the chunk
    -level constant-velocity prior simultaneously (vmapped — the robust
    GN runs 20-wide, MXU-sized); each further pass re-matches and
    re-solves around the pair's OWN previous estimate, recovering the
    per-pair prior quality of the sequential recurrence. Measured ~3x
    faster per frame than the scan at equal tracking quality.

    Accepts uint8 images (converted to [0, 1] f32 on device): the
    host->device image stream is 4x smaller, which is the wall-clock
    bottleneck on PCIe/tunnel-attached accelerators (source images are
    8-bit anyway, so nothing is lost).
    """
    if imgs_l.dtype == jnp.uint8:
        imgs_l = imgs_l.astype(jnp.float32) * (1.0 / 255.0)
        imgs_r = imgs_r.astype(jnp.float32) * (1.0 / 255.0)
    pts, lns = jax.vmap(lambda a, b: extract_stereo_frame(a, b, cam, cfg)
                        )(imgs_l, imgs_r)

    if cfg.tracking.batched_chunks:
        return _chunk_tracking_batched(pts, lns, prev_pts, prev_lns,
                                       T_prior0, cam, cfg, keep_feats)

    def body(carry, feat_i):
        prev_p, prev_l, T_prior = carry
        pts_i, lns_i = feat_i
        if pts_i.uv.shape[0] > 0:
            mres = match_f2f_points(prev_p, pts_i, T_prior, cam, cfg)
            terms = build_point_terms(prev_p, pts_i, mres)
        else:  # lines-only configuration (has_points=false)
            terms = pose_gn.PointTerms(jnp.zeros((0, 3)), jnp.zeros((0, 2)),
                                       jnp.zeros((0,), bool))
        if prev_l is not None:
            ml = match_f2f_lines(prev_l, lns_i, T_prior, cam, cfg)
            ln_terms = build_line_terms(prev_l, lns_i, ml)
        else:
            ln_terms = None
        res = pose_gn.optimize_pose(T_prior, cam, terms, ln_terms, cfg)
        # constant-velocity prior for the next frame; identity fallback
        # if the solve was rejected
        T_next = jnp.where(res.good, res.T, T_prior)
        return (pts_i, lns_i, T_next), (res.T, res.cov, res.n_inliers,
                                        res.err, res.good)

    (last_p, last_l, T_last), (DT, cov, ninl, err, good) = lax.scan(
        body, (prev_pts, prev_lns, T_prior0), (pts, lns))
    all_pts = all_lns = None
    if keep_feats:
        # descriptors ride the feature stack bit-PACKED (u8 bits -> u32
        # words, 8x smaller): chunk outputs cross the host link on
        # runtimes that commit output buffers eagerly, and desc is ~80%
        # of the feature bytes. The SLAM driver unpacks at KF-slice time.
        all_pts, all_lns = _pack_feats(pts, lns)
    return ChunkOutput(DT, cov, ninl, err, good, last_p, last_l,
                       DT_next=T_last, all_pts=all_pts, all_lns=all_lns)


def _pack_feats(pts, lns):
    """Bit-pack descriptors for host transport (see keep_feats docs)."""
    from plslam_tpu.ops import hamming
    all_pts = pts._replace(desc=jax.vmap(hamming.pack_bits)(pts.desc))
    all_lns = (lns._replace(desc=jax.vmap(hamming.pack_bits)(lns.desc))
               if lns is not None else None)
    return all_pts, all_lns


def _chunk_tracking_batched(pts, lns, prev_pts, prev_lns, T_prior0, cam,
                            cfg, keep_feats: bool) -> ChunkOutput:
    """All B consecutive-pair solves of a chunk as ONE vmapped program."""
    B = pts.uv.shape[0]
    shift = lambda head, tail: jax.tree_util.tree_map(
        lambda h, t: jnp.concatenate([h[None], t[:-1]], axis=0), head, tail)
    prev_p = shift(prev_pts, pts)
    prev_l = shift(prev_lns, lns) if lns is not None else None

    def one(prev_pi, prev_li, pts_i, lns_i, Tp, c):
        if pts_i.uv.shape[0] > 0:
            mres = match_f2f_points(prev_pi, pts_i, Tp, cam, c)
            terms = build_point_terms(prev_pi, pts_i, mres)
        else:  # lines-only configuration (has_points=false)
            terms = pose_gn.PointTerms(jnp.zeros((0, 3)), jnp.zeros((0, 2)),
                                       jnp.zeros((0,), bool))
        if prev_li is not None:
            ml = match_f2f_lines(prev_li, lns_i, Tp, cam, c)
            ln_terms = build_line_terms(prev_li, lns_i, ml)
        else:
            ln_terms = None
        return pose_gn.optimize_pose(Tp, cam, terms, ln_terms, c)

    # non-final passes only produce the PRIOR for the next pass, so they
    # run a shortened GN (the final full pass converges from any nearby
    # prior); a pair that never solves in the final pass keeps its lite
    # result — still outlier-gated, just fewer polish iterations
    lp = cfg.tracking.lite_pass_iters
    cfg_lite = (cfg.with_updates(
        {"tracking": {"max_iters": lp,
                      "max_iters_ref": cfg.tracking.lite_pass_iters_ref}})
        if lp > 0 and cfg.tracking.chunk_passes > 1 else cfg)

    def mk_solve(c):
        if lns is None:
            return jax.vmap(lambda a, cc, t: one(a, None, cc, None, t, c))
        return jax.vmap(lambda a, b2, cc, d, t: one(a, b2, cc, d, t, c))

    solve = mk_solve(cfg)
    solve_lite = mk_solve(cfg_lite)
    args = (prev_p, pts) if lns is None else (prev_p, prev_l, pts, lns)

    n_passes = max(cfg.tracking.chunk_passes, 1)
    T_pri = jnp.broadcast_to(T_prior0, (B, 4, 4))
    res = (solve_lite if n_passes > 1 else solve)(*args, T_pri)
    for k in range(n_passes - 1):
        # re-solve around each pair's own estimate; pairs whose solve
        # failed so far retry from their left neighbor's estimate
        # (consecutive pairs have near-identical motion), falling back
        # to the chunk prior
        nb_T = jnp.concatenate([T_pri[:1], res.T[:-1]], axis=0)
        nb_good = jnp.concatenate([jnp.zeros((1,), bool), res.good[:-1]])
        T_pri = jnp.where(res.good[:, None, None], res.T,
                          jnp.where(nb_good[:, None, None], nb_T, T_pri))
        res_new = (solve if k == n_passes - 2 else solve_lite)(*args, T_pri)
        # keep the best result per pair: a pair that solved in an earlier
        # pass must not lose its estimate to a later failed re-solve
        keep_new = res_new.good | ~res.good
        res = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                keep_new.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
            res_new, res)

    last_p = jax.tree_util.tree_map(lambda x: x[-1], pts)
    last_l = (jax.tree_util.tree_map(lambda x: x[-1], lns)
              if lns is not None else None)
    all_pts = all_lns = None
    if keep_feats:
        all_pts, all_lns = _pack_feats(pts, lns)
    DT_next = jnp.where(res.good[-1], res.T[-1], T_pri[-1])
    return ChunkOutput(res.T, res.cov, res.n_inliers, res.err, res.good,
                       last_p, last_l, DT_next=DT_next,
                       all_pts=all_pts, all_lns=all_lns)


@partial(jax.jit, static_argnames=("cfg",))
def extract_one(img_l, img_r, cam, cfg
                ) -> Tuple[PointObservations, Optional[LineObservations]]:
    return extract_stereo_frame(img_l, img_r, cam, cfg)


class BatchedStereoVO:
    """Host driver for chunked VO. API: feed chunks, get per-frame poses.

    KF-style decisions happen at chunk granularity (the mapping thread of
    the full system consumes them asynchronously anyway).
    """

    def __init__(self, cfg: SlamConfig, cam: Optional[StereoCamera] = None):
        self.cfg = cfg
        self.cam = cam if cam is not None else StereoCamera.from_config(cfg.camera)
        self.prev_pts: Optional[PointObservations] = None
        self.prev_lns: Optional[LineObservations] = None
        self.T_wc = np.eye(4, dtype=np.float32)
        self.DT_prev = np.eye(4, dtype=np.float32)
        self.trajectory = [self.T_wc.copy()]
        self._pending = []
        # host mirror of the last integrated step, the tracking-failure
        # fallback during drain (DT_prev may be a device ref in pipelined
        # mode and must not be fetched on the submit path)
        self._last_step_host = np.eye(4, dtype=np.float32)

    def initialize(self, img_l: np.ndarray, img_r: np.ndarray) -> None:
        self.prev_pts, self.prev_lns = extract_one(
            jnp.asarray(img_l), jnp.asarray(img_r), self.cam, self.cfg)

    def process_chunk(self, imgs_l: np.ndarray, imgs_r: np.ndarray
                      ) -> ChunkOutput:
        """(B, H, W) arrays -> per-frame results; updates the trajectory."""
        out = self.submit_chunk(imgs_l, imgs_r)
        self._integrate(out)
        return out

    # -- pipelined mode -------------------------------------------------------
    # submit_chunk only enqueues device work: the carry (last features,
    # next prior) is threaded through as device references, so chunk k+1
    # can be dispatched while chunk k still executes. drain() fetches the
    # per-frame poses and integrates the trajectory. On dispatch-latency-
    # bound rigs (remote TPU runtimes) this hides the launch + fetch
    # round-trip behind device compute.

    def submit_chunk(self, imgs_l: np.ndarray, imgs_r: np.ndarray,
                     keep_feats: bool = False) -> ChunkOutput:
        assert self.prev_pts is not None, "call initialize() first"
        out = vo_chunk(jnp.asarray(imgs_l), jnp.asarray(imgs_r),
                       self.prev_pts, self.prev_lns,
                       jnp.asarray(self.DT_prev), self.cam, self.cfg,
                       keep_feats=keep_feats)
        self.prev_pts, self.prev_lns = out.last_pts, out.last_lns
        # device-side prior for the next chunk, computed in-program
        # (no host sync, no extra dispatch)
        self.DT_prev = out.DT_next
        self._pending.append(out)
        return out

    def drain(self) -> None:
        """Fetch all pending chunk results and extend the trajectory."""
        for out in self._pending:
            self._integrate(out, update_prior=False)
        self._pending = []

    def _integrate(self, out: ChunkOutput, update_prior: bool = True,
                   fetched=None) -> None:
        """``fetched=(DT, good)`` skips the device fetch when the caller
        already holds the host copies (each fetch is a tunnel round trip)."""
        self._pending = [p for p in self._pending if p is not out]
        DT, good = (fetched if fetched is not None
                    else jax.device_get((out.DT, out.good)))
        DT_prev = self._last_step_host
        for i in range(DT.shape[0]):
            step = DT[i] if good[i] else DT_prev
            self.T_wc = (self.T_wc @ np.linalg.inv(step)).astype(np.float32)
            DT_prev = step.astype(np.float32)
            self.trajectory.append(self.T_wc.copy())
        self._last_step_host = DT_prev
        if update_prior:
            self.DT_prev = DT_prev
