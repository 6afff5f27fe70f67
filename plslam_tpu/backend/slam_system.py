"""Full SLAM system: stereo VO front-end + mapping back-end (+ loop
closure when enabled).

Reference parity: the wiring in pl-slam ``app/plslam_dataset.cpp`` —
StVO tracks every frame; on the KF criterion the frame is promoted to a
KeyFrame and handed to MapHandler (queue when multithreaded); LBA
corrections re-anchor the odometry. finishSLAM drains the queue and
emits the final trajectory.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.stereo_frame import make_extractor
from plslam_tpu.tracking.frame_handler import FrameResult, StereoVO


class SlamFrameResult(NamedTuple):
    frame: FrameResult
    kf_slot: Optional[int]


class PLSLAM:
    def __init__(self, cfg: SlamConfig, cam: Optional[StereoCamera] = None,
                 enable_loops: Optional[bool] = None):
        self.cfg = cfg
        self.cam = cam if cam is not None else StereoCamera.from_config(cfg.camera)
        self.vo = StereoVO(cfg, self.cam,
                           extract_fn=make_extractor(self.cam, cfg))
        from plslam_tpu.backend.map_handler import MapHandler
        self.map = MapHandler(cfg, self.cam)
        self.enable_loops = (cfg.loop.enabled if enable_loops is None
                             else enable_loops)
        self.loop_closer = None
        if self.enable_loops:
            from plslam_tpu.loop.loop_closer import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.cam)
        # per-frame anchoring: (kf_slot_at_process_time, T_rel_to_that_kf)
        self._frame_anchor: List[Tuple[int, np.ndarray]] = []
        self._kf_slot = -1
        self._T_kf_at_insert = np.eye(4, dtype=np.float32)

    # -- lifecycle -----------------------------------------------------------
    def initialize(self, img_l: np.ndarray, img_r: np.ndarray) -> SlamFrameResult:
        fr = self.vo.initialize(img_l, img_r)
        pts, lns = self.vo.current_features
        s = self.map.add_keyframe(pts, lns, self.vo.T_wc, run_lba=False)
        self._kf_slot = 0
        self._T_kf_at_insert = self.vo.T_wc.copy()
        self._frame_anchor = [(0, np.eye(4, dtype=np.float32))]
        if self.loop_closer is not None:
            self.loop_closer.on_keyframe(self.map, 0)
        return SlamFrameResult(fr, 0)

    def process(self, img_l: np.ndarray, img_r: np.ndarray) -> SlamFrameResult:
        fr = self.vo.insert_stereo_pair(img_l, img_r)
        T_rel = np.linalg.inv(self._T_kf_at_insert) @ fr.T_wc
        self._frame_anchor.append((self._kf_slot, T_rel.astype(np.float32)))
        kf_slot = None
        if fr.is_kf:
            pts, lns = self.vo.current_features
            summary = self.map.add_keyframe(pts, lns, fr.T_wc)
            kf_slot = self._kf_slot + 1
            self._kf_slot = kf_slot
            self._T_kf_at_insert = fr.T_wc.copy()
            if summary is not None:
                # synchronous mode: apply the LBA correction immediately
                self._apply_correction(summary.T_w_kf, fr.T_wc)
            if self.loop_closer is not None:
                self.map.wait_idle()
                corrected = self.loop_closer.on_keyframe(self.map, kf_slot)
                if corrected is not None:
                    self._apply_correction(corrected, fr.T_wc)
        return SlamFrameResult(fr, kf_slot)

    def _apply_correction(self, T_corrected: np.ndarray, T_old: np.ndarray):
        """Re-anchor the odometry after the back-end moved the latest KF."""
        self.vo.T_wc = np.asarray(T_corrected, np.float32)
        self.vo.T_kf = self.vo.T_wc.copy()
        self._T_kf_at_insert = self.vo.T_wc.copy()

    def finish(self) -> np.ndarray:
        """finishSLAM parity: drain mapping, recompose the final
        trajectory from corrected KF poses + per-frame relatives."""
        self.map.wait_idle()
        kf_poses = self.map.kf_poses()
        out = []
        for kf_slot, T_rel in self._frame_anchor:
            slot = min(kf_slot, len(kf_poses) - 1)
            out.append(kf_poses[slot] @ T_rel)
        self.map.close()
        return np.stack(out)


class ChunkedPLSLAM:
    """Full SLAM on the chunked/pipelined tracker: B frames per device
    dispatch (tracking.batch_vo with ``keep_feats``), host-side KF
    decisions from the fetched per-frame covariances, KF features sliced
    out of the chunk's device-resident feature stack, mapping + loop
    closure on the worker thread.

    Back-end corrections (LBA, loops) are applied at trajectory
    recomposition time (``finish``) rather than fed back mid-chunk — the
    async-mapping analogue of the reference's delayed correction
    pickup. Odometry quality within a chunk is unaffected.
    """

    def __init__(self, cfg: SlamConfig, cam: Optional[StereoCamera] = None,
                 enable_loops: Optional[bool] = None):
        from plslam_tpu.tracking.batch_vo import BatchedStereoVO
        from plslam_tpu.tracking.frame_handler import KeyframeCriterion
        from plslam_tpu.backend.map_handler import MapHandler
        self.cfg = cfg
        self.cam = cam if cam is not None else StereoCamera.from_config(cfg.camera)
        self.vo = BatchedStereoVO(cfg, self.cam)
        self.map = MapHandler(cfg, self.cam)
        self.kf_criterion = KeyframeCriterion(cfg)
        self.enable_loops = (cfg.loop.enabled if enable_loops is None
                             else enable_loops)
        self.loop_closer = None
        if self.enable_loops:
            from plslam_tpu.loop.loop_closer import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.cam)
        self._frame_anchor = []
        self._kf_slot = -1
        self._T_kf_at_insert = np.eye(4, dtype=np.float32)
        self._T_kf = np.eye(4, dtype=np.float32)
        self._inflight = []        # n_valid per pending chunk

    def initialize(self, img_l: np.ndarray, img_r: np.ndarray) -> None:
        self.vo.initialize(img_l, img_r)
        on_done = None
        if self.loop_closer is not None:
            on_done = (lambda s:
                       self.loop_closer.on_keyframe(self.map, s.slot))
        self.map.add_keyframe(self.vo.prev_pts, self.vo.prev_lns,
                              np.eye(4, dtype=np.float32), run_lba=False,
                              on_done=on_done)
        self._kf_slot = 0
        self._frame_anchor = [(0, np.eye(4, dtype=np.float32))]

    def process_chunk(self, imgs_l: np.ndarray, imgs_r: np.ndarray,
                      n_valid: Optional[int] = None) -> int:
        """Track a (B, H, W) chunk; returns the number of new KFs
        settled so far. Pipelined: the chunk is only SUBMITTED here; the
        host-side work (fetch, KF decisions, mapping hand-off) happens
        for the previous chunk while this one executes on device."""
        # interleave the back-end's device programs with the tracking
        # chunks: wait until queued mapping jobs are DISPATCHED (their
        # fetches pipeline on the worker) before enqueueing more
        # tracking work ahead of them in the stream
        self.map.wait_dispatched()
        self.vo.submit_chunk(imgs_l, imgs_r, keep_feats=True)
        self._inflight.append(n_valid)
        if len(self._inflight) >= 2:
            return self._settle_one()
        return 0

    def _settle_one(self) -> int:
        import jax
        out = self.vo._pending[0]
        n_valid = self._inflight.pop(0)
        base = len(self.vo.trajectory)
        DT, cov, good = jax.device_get((out.DT, out.cov, out.good))
        self.vo._integrate(out, update_prior=False, fetched=(DT, good))
        B = DT.shape[0] if n_valid is None else n_valid
        kf_frames, kf_rels = [], []
        for i in range(B):
            T_wc = self.vo.trajectory[base + i]
            T_rel = np.linalg.inv(self._T_kf_at_insert) @ T_wc
            self._frame_anchor.append((self._kf_slot, T_rel.astype(np.float32)))
            is_kf, _ = self.kf_criterion.update(
                DT[i], cov[i], bool(good[i]),
                np.linalg.inv(self._T_kf) @ T_wc)
            if is_kf:
                kf_frames.append(i)
                # pose RELATIVE to the previous KF: the back-end composes
                # it against that KF's current (LBA/loop-corrected) pose,
                # so corrections feed the live map instead of being
                # deferred to finish()
                kf_rels.append(
                    (np.linalg.inv(self._T_kf) @ T_wc).astype(np.float32))
                self._kf_slot += 1
                self._T_kf_at_insert = T_wc.copy()
                self._T_kf = T_wc.copy()
        if kf_frames:
            # the whole chunk back-end (KF slicing + mapping + BoW probe,
            # and the loop closer's host logic) rides the mapping worker
            # as ONE fused dispatch + ONE fetch — the tracking path never
            # blocks on the back-end and spends no per-KF round trips
            self.map.add_keyframes_fused(out.all_pts, out.all_lns,
                                         kf_frames, kf_rels,
                                         loop_closer=self.loop_closer)
        return len(kf_frames)

    def online_pose(self) -> np.ndarray:
        """Map-consistent CURRENT pose (not post-hoc): the latest KF's
        pose as the back-end holds it now — including LBA and loop
        corrections — composed with the tracker's raw relative chain
        since that KF. The reference's delayed correction pickup gives
        the same semantics; round 1 only produced corrected poses at
        finish()."""
        # async mode: _kf_slot advances at decision time on the tracker
        # thread; wait until the worker has DISPATCHED the insertion (a
        # dispatch updates the device-state refs), or the slot would
        # still read its identity-initialized placeholder
        self.map.wait_dispatched()
        slot = max(self._kf_slot, 0)
        T_kf = self.map.latest_kf_pose(slot)
        T_rel = np.linalg.inv(self._T_kf_at_insert) @ self.vo.T_wc
        return (T_kf @ T_rel).astype(np.float32)

    def finish(self) -> np.ndarray:
        while self._inflight:
            self._settle_one()
        self.vo.drain()
        self.map.wait_idle()
        kf_poses = self.map.kf_poses()
        out = []
        for kf_slot, T_rel in self._frame_anchor:
            slot = min(kf_slot, len(kf_poses) - 1)
            out.append(kf_poses[slot] @ T_rel)
        self.map.close()
        return np.stack(out)
