"""Frame-to-frame stereo visual odometry driver.

Reference parity: stvo-pl ``src/stereoFrameHandler.cpp`` —
``initialize``, ``insertStereoPair``, ``f2fTracking``
(``matchF2FPoints``/``matchF2FLines``), ``optimizePose``, ``updateFrame``
and the keyframe criterion ``currFrameIsKF`` (covariance-entropy ratio +
max translation/rotation caps).

Architecture: the whole per-frame computation (feature extraction of the
new stereo pair, windowed f2f matching, robust GN solve, KF statistics)
is ONE jitted program; the host class only holds the previous frame's
feature arrays, accumulates the trajectory, and makes the (boolean) KF
decision from scalars the program returns.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie, robust
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import (LineObservations, PointObservations)
from plslam_tpu.frontend.stereo_points import extract_stereo_points
from plslam_tpu.ops import hamming
from plslam_tpu.ops.gather import take_mxu
from plslam_tpu.tracking import pose_gn


def match_f2f_points(prev: PointObservations, cur: PointObservations,
                     T_prior: jnp.ndarray, cam: StereoCamera,
                     cfg: SlamConfig) -> hamming.MatchResult:
    """matchF2FPoints parity: search the current frame in a window around
    the position predicted by the constant-velocity prior."""
    m = cfg.matching
    uv_pred = cam.project(lie.transform_points(T_prior, prev.P))
    dist = hamming.hamming_matrix(prev.desc, cur.desc, prev.valid, cur.valid,
                                  bf16=cfg.system.bf16_matching)
    win = hamming.window_mask(uv_pred, cur.uv, m.f2f_window)
    oct_ok = jnp.abs(prev.octave[:, None] - cur.octave[None, :]) <= 1
    dist = hamming.apply_mask(dist, win & oct_ok)
    return hamming.match_nnr(dist, m.max_hamming_p, m.min_ratio_12_p,
                             mutual=m.best_lr_matches)


def match_f2f_lines(prev: LineObservations, cur: LineObservations,
                    T_prior: jnp.ndarray, cam: StereoCamera,
                    cfg: SlamConfig) -> hamming.MatchResult:
    """matchF2FLines parity: LBD NN within a window around the predicted
    midpoint, gated on angular consistency."""
    m = cfg.matching
    mid_prev = 0.5 * (prev.sP + prev.eP)
    mid_pred = cam.project(lie.transform_points(T_prior, mid_prev))
    mid_cur = 0.5 * (cur.sp + cur.ep)
    dist = hamming.hamming_matrix(prev.desc, cur.desc, prev.valid, cur.valid,
                                  bf16=cfg.system.bf16_matching)
    win = hamming.window_mask(mid_pred, mid_cur, m.f2f_window)
    dang = jnp.abs(prev.angle[:, None] - cur.angle[None, :])
    dang = jnp.minimum(dang, jnp.pi - dang)  # undirected segments
    ang_ok = dang < 0.3
    dist = hamming.apply_mask(dist, win & ang_ok)
    return hamming.match_nnr(dist, m.max_hamming_l, m.min_ratio_12_l,
                             mutual=m.best_lr_matches)


class TrackOutput(NamedTuple):
    pose: pose_gn.PoseResult
    n_matches_pt: jnp.ndarray
    n_matches_ln: jnp.ndarray
    match_idx_pt: jnp.ndarray   # (K,) prev -> cur index or -1
    match_idx_ln: jnp.ndarray   # (L,) prev -> cur index or -1


def build_point_terms(prev: PointObservations, cur: PointObservations,
                      mres: hamming.MatchResult) -> pose_gn.PointTerms:
    idx = jnp.maximum(mres.idx, 0)
    uv_obs = take_mxu(cur.uv, idx)
    valid = mres.valid & prev.valid
    return pose_gn.PointTerms(prev.P, uv_obs, valid)


def build_line_terms(prev: LineObservations, cur: LineObservations,
                     mres: hamming.MatchResult) -> pose_gn.LineTerms:
    idx = jnp.maximum(mres.idx, 0)
    le_obs = take_mxu(cur.le, idx)
    valid = mres.valid & prev.valid
    return pose_gn.LineTerms(prev.sP, prev.eP, le_obs, valid)


@partial(jax.jit, static_argnames=("cfg",))
def track_step(prev_pts: PointObservations, prev_lns: Optional[LineObservations],
               cur_pts: PointObservations, cur_lns: Optional[LineObservations],
               T_prior: jnp.ndarray, cam: StereoCamera, cfg: SlamConfig
               ) -> TrackOutput:
    """f2fTracking + optimizePose as one program."""
    if cfg.points.has_points and prev_pts.capacity > 0:
        mp = match_f2f_points(prev_pts, cur_pts, T_prior, cam, cfg)
        pt_terms = build_point_terms(prev_pts, cur_pts, mp)
        mp_idx, n_pt = mp.idx, jnp.sum(mp.valid)
    else:
        pt_terms = pose_gn.PointTerms(jnp.zeros((0, 3)), jnp.zeros((0, 2)),
                                      jnp.zeros((0,), bool))
        mp_idx = jnp.zeros((0,), jnp.int32)
        n_pt = jnp.asarray(0)
    if prev_lns is not None and cfg.lines.has_lines:
        ml = match_f2f_lines(prev_lns, cur_lns, T_prior, cam, cfg)
        ln_terms = build_line_terms(prev_lns, cur_lns, ml)
        ml_idx, n_ln = ml.idx, jnp.sum(ml.valid)
    else:
        ln_terms = None
        ml_idx = jnp.zeros((0,), jnp.int32)
        n_ln = jnp.asarray(0)
    res = pose_gn.optimize_pose(T_prior, cam, pt_terms, ln_terms, cfg)
    return TrackOutput(res, n_pt, n_ln, mp_idx, ml_idx)


class KeyframeCriterion:
    """currFrameIsKF parity, host-side: covariance-entropy ratio of the
    motion accumulated since the last KF (adjoint-compounded) vs the
    first post-KF frame, plus max translation/rotation caps. Shared by
    the per-frame driver and the chunked SLAM driver."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.cov_kf: Optional[np.ndarray] = None
        self.entropy_first: Optional[float] = None
        self.frames_since_kf = 0

    def reset(self) -> None:
        self.cov_kf = None
        self.entropy_first = None
        self.frames_since_kf = 0

    @staticmethod
    def _adjoint_np(T: np.ndarray) -> np.ndarray:
        R = T[:3, :3]
        t = T[:3, 3]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]], T.dtype)
        out = np.zeros((6, 6), T.dtype)
        out[:3, :3] = R
        out[:3, 3:] = tx @ R
        out[3:, 3:] = R
        return out

    def update(self, DT: np.ndarray, cov: np.ndarray, good: bool,
               T_from_kf: np.ndarray) -> Tuple[bool, float]:
        """Feed one tracked frame; returns (is_kf, entropy_ratio).

        Pure numpy: this runs per frame on the host (6x6-scale math);
        jnp versions here cost several device round-trips per frame,
        which dominated the chunked driver's wall time.
        """
        self.frames_since_kf += 1
        if self.cov_kf is None:
            self.cov_kf = cov
        else:
            Adj = self._adjoint_np(np.asarray(DT))
            self.cov_kf = Adj @ self.cov_kf @ Adj.T + cov
        sign, logdet = np.linalg.slogdet(self.cov_kf)
        h = 0.5 * logdet if sign > 0 else -np.inf
        if self.entropy_first is None:
            self.entropy_first = h
        ratio = h / self.entropy_first if self.entropy_first != 0 else 1.0

        t_dist = float(np.linalg.norm(T_from_kf[:3, 3]))
        r_dist = float(np.arccos(np.clip(
            (np.trace(T_from_kf[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)))
        k = self.cfg.keyframe
        is_kf = good and self.frames_since_kf >= k.min_kf_n_frames and (
            ratio < k.min_entropy_ratio
            or t_dist > k.max_kf_t_dist
            or r_dist > np.deg2rad(k.max_kf_r_dist))
        if is_kf:
            self.reset()
        return is_kf, ratio


class FrameResult(NamedTuple):
    """Host-side per-frame output (numpy scalars / small arrays)."""
    T_wc: np.ndarray        # (4, 4) camera-to-world pose of this frame
    DT: np.ndarray          # (4, 4) relative pose prev->cur (prev-frame coords)
    good: bool
    is_kf: bool
    n_inliers: int
    err: float
    entropy_ratio: float


class StereoVO:
    """Host driver class (StereoFrameHandler parity).

    Keeps the previous frame's device-resident feature arrays and the
    integrated trajectory; all numerics are in jitted programs.
    """

    def __init__(self, cfg: SlamConfig, cam: Optional[StereoCamera] = None,
                 extract_fn=None):
        self.cfg = cfg
        self.cam = cam if cam is not None else StereoCamera.from_config(cfg.camera)
        # pluggable extractor so the point-only and point+line front-ends
        # share this driver (set by apps; default = points only)
        self._extract = extract_fn or (
            lambda imL, imR: (extract_stereo_points(imL, imR, self.cam, self.cfg),
                              None))
        self.prev_pts: Optional[PointObservations] = None
        self.prev_lns: Optional[LineObservations] = None
        self.T_wc = np.eye(4, dtype=np.float32)
        self.DT_prev = np.eye(4, dtype=np.float32)
        self.kf_criterion = KeyframeCriterion(cfg)
        self.T_kf = np.eye(4, dtype=np.float32)   # pose of last KF
        self.trajectory = []     # list of (4,4) np poses

    # -- API parity: initialize / insertStereoPair ---------------------------
    def initialize(self, img_l: np.ndarray, img_r: np.ndarray) -> FrameResult:
        self.prev_pts, self.prev_lns = self._extract(
            jnp.asarray(img_l), jnp.asarray(img_r))
        self.trajectory = [self.T_wc.copy()]
        return FrameResult(self.T_wc.copy(), np.eye(4, dtype=np.float32),
                           True, True, 0, 0.0, 1.0)

    def insert_stereo_pair(self, img_l: np.ndarray, img_r: np.ndarray
                           ) -> FrameResult:
        assert self.prev_pts is not None, "call initialize() first"
        cur_pts, cur_lns = self._extract(jnp.asarray(img_l), jnp.asarray(img_r))
        out = track_step(self.prev_pts, self.prev_lns, cur_pts, cur_lns,
                         jnp.asarray(self.DT_prev), self.cam, self.cfg)
        res = out.pose
        good = bool(res.good)
        if good:
            DT = np.asarray(res.T)
            cov = np.asarray(res.cov)
        else:
            # tracking failure handling (reference: keep prior, flag frame)
            DT = self.DT_prev.copy()
            cov = np.eye(6, dtype=np.float32) * 1e3

        # updateFrame parity
        self.T_wc = (self.T_wc @ np.linalg.inv(DT)).astype(np.float32)
        self.DT_prev = DT
        self.prev_pts, self.prev_lns = cur_pts, cur_lns
        self.trajectory.append(self.T_wc.copy())

        T_from_kf = np.linalg.inv(self.T_kf) @ self.T_wc
        is_kf, ratio = self.kf_criterion.update(DT, cov, good, T_from_kf)
        if is_kf:
            self.T_kf = self.T_wc.copy()
        return FrameResult(self.T_wc.copy(), DT, good, is_kf,
                           int(res.n_inliers), float(res.err), ratio)

    @property
    def current_features(self) -> Tuple[PointObservations, Optional[LineObservations]]:
        return self.prev_pts, self.prev_lns
