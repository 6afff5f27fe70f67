"""Map handler: windowed LBA over the map state + the host-side driver.

Reference parity: the optimization half of pl-slam ``src/mapHandler.cpp``
— ``localBundleAdjustment`` window selection (last-N local KFs free,
older KFs observing shared landmarks fixed), write-back of optimized
poses/landmarks, outlier-observation marking — plus the optional
mapping-thread execution model (``MapHandler`` queue + mutex,
SURVEY.md §2.3 P3) reproduced with a host worker thread: tracking keeps
dispatching jitted steps while LBA programs run asynchronously; device
ordering guarantees consistency of the state buffers.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.backend import lba
from plslam_tpu.backend.map import (MapState, add_keyframe, cull_landmarks,
                                    init_map_state, remove_redundant_kfs)


@partial(jax.jit, static_argnames=("cfg",))
def run_window_lba(state: MapState, cam: StereoCamera, cfg: SlamConfig
                   ) -> Tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Build the LBA problem from the last (window+fixed) KF slots, run
    robust LM, scatter results back. Returns (state, cost0, cost1)."""
    m = cfg.mapping
    span = m.window_kfs + m.fixed_kfs
    F = state.kf_pose.shape[0]
    start = jnp.clip(state.n_kfs - span, 0, max(F - span, 0))
    slots = start + jnp.arange(span)

    kf_pose_w = state.kf_pose[slots]
    T_cw = jax.vmap(lie.inverse_se3)(kf_pose_w)
    kf_valid = state.kf_valid[slots]
    # non-local (older than the last window_kfs) and the very first KF
    # stay fixed — gauge + the reference's fixed-KF scheme
    fixed = (slots < state.n_kfs - m.window_kfs) | (slots == 0)

    Ml = state.ln_spos.shape[0]
    ep_pos = jnp.stack([state.ln_spos, state.ln_epos], axis=1).reshape(2 * Ml, 3)
    ln_lm = state.obs_ln_lm[slots]
    sid = jnp.where(ln_lm >= 0, 2 * ln_lm, -1)
    eid = jnp.where(ln_lm >= 0, 2 * ln_lm + 1, -1)

    prob = lba.LBAProblem(
        kf_pose=T_cw, kf_fixed=fixed, kf_valid=kf_valid,
        pt_pos=state.pt_pos, ep_pos=ep_pos,
        obs_pt_uv=state.obs_pt_uv[slots],
        obs_pt_disp=state.obs_pt_disp[slots],
        obs_pt_id=state.obs_pt_lm[slots],
        obs_ln_le=state.obs_ln_le[slots],
        obs_ln_sid=sid, obs_ln_eid=eid)
    res = lba.run_lba(prob, cam, cfg)

    new_pose_w = jax.vmap(lie.inverse_se3)(res.kf_pose)
    kf_pose = state.kf_pose.at[slots].set(
        jnp.where(kf_valid[:, None, None], new_pose_w, kf_pose_w))
    eps = res.ep_pos.reshape(Ml, 2, 3)
    # mark outlier observations (mapHandler outlier flags): detach them
    obs_pt_lm = state.obs_pt_lm.at[slots].set(
        jnp.where(res.obs_pt_inlier | (state.obs_pt_lm[slots] < 0),
                  state.obs_pt_lm[slots], -1))
    obs_ln_lm = state.obs_ln_lm.at[slots].set(
        jnp.where(res.obs_ln_inlier | (state.obs_ln_lm[slots] < 0),
                  state.obs_ln_lm[slots], -1))
    new_state = state._replace(kf_pose=kf_pose, pt_pos=res.pt_pos,
                               ln_spos=eps[:, 0], ln_epos=eps[:, 1],
                               obs_pt_lm=obs_pt_lm, obs_ln_lm=obs_ln_lm)
    return new_state, res.cost0, res.cost1


@partial(jax.jit, static_argnames=("cfg", "run_lba_flag"))
def mapping_step(state: MapState, pts, lns, T_w_kf, cam: StereoCamera,
                 cfg: SlamConfig, run_lba_flag: bool = True):
    """The full per-KF back-end pipeline as ONE device program:
    KF insertion + map matching + triangulation, windowed LBA,
    redundant-KF removal, landmark culling. Fusing these (they were four
    dispatches) matters on dispatch-latency-bound runtimes — the mapping
    thread shares the chip's single execution stream with tracking, so
    every saved round-trip is tracking throughput."""
    state, diag = add_keyframe(state, pts, lns, T_w_kf, cam, cfg)
    c0 = c1 = jnp.asarray(0.0)
    if run_lba_flag:
        state, c0, c1 = run_window_lba(state, cam, cfg)
        state, _ = remove_redundant_kfs(state, cfg)
    state = cull_landmarks(state, cfg)
    return state, diag, c0, c1


class KeyFrameSummary(NamedTuple):
    slot: int
    T_w_kf: np.ndarray          # corrected pose after LBA
    n_map_matches: int
    n_new_points: int
    lba_cost0: float
    lba_cost1: float


class MapHandler:
    """Host driver holding the device-resident MapState.

    ``async_mapping=True`` reproduces the reference's mapping thread: KF
    jobs go to a worker; the tracker thread never blocks on LBA. Pose
    corrections are picked up by the SLAM system at the next KF.
    """

    def __init__(self, cfg: SlamConfig, cam: StereoCamera):
        self.cfg = cfg
        self.cam = cam
        self.state = init_map_state(cfg)
        self.summaries = []
        self._lock = threading.Lock()
        self._async = cfg.system.async_mapping
        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        if self._async:
            self._worker = threading.Thread(target=self._work_loop, daemon=True)
            self._worker.start()

    # -- keyframe ingestion --------------------------------------------------
    def add_keyframe(self, pts, lns, T_w_kf: np.ndarray, run_lba: bool = True,
                     on_done=None) -> Optional[KeyFrameSummary]:
        """``on_done(summary)`` runs after the KF is processed — on the
        worker thread in async mode (so e.g. loop-closure checks ride the
        mapping thread instead of blocking the tracker), inline in sync
        mode."""
        if self._async:
            self._queue.put((pts, lns, np.asarray(T_w_kf), run_lba, on_done))
            return None
        summary = self._process(pts, lns, T_w_kf, run_lba)
        if on_done is not None:
            on_done(summary)
        return summary

    def _work_loop(self):
        while True:
            job = self._queue.get()
            if job is None:
                self._queue.task_done()
                return
            try:
                summary = self._process(*job[:4])
                if job[4] is not None:
                    job[4](summary)
            except Exception as e:  # surfaced via summaries
                print(f"[map_handler] worker error: {e!r}")
            finally:
                self._queue.task_done()

    def _process(self, pts, lns, T_w_kf, run_lba_flag) -> KeyFrameSummary:
        with self._lock:
            state, diag, c0, c1 = mapping_step(
                self.state, pts, lns, jnp.asarray(T_w_kf, jnp.float32),
                self.cam, self.cfg, run_lba_flag=bool(run_lba_flag))
            self.state = state
            # one batched host fetch for the whole summary (each separate
            # np.asarray is a full runtime round-trip)
            slot_d = diag["kf_slot"]
            fetched = jax.device_get(
                (slot_d, jnp.take(state.kf_pose, slot_d, axis=0),
                 diag["n_map_matches"], diag["n_new_points"], c0, c1))
            summary = KeyFrameSummary(
                slot=int(fetched[0]), T_w_kf=np.asarray(fetched[1]),
                n_map_matches=int(fetched[2]), n_new_points=int(fetched[3]),
                lba_cost0=float(fetched[4]), lba_cost1=float(fetched[5]))
            self.summaries.append(summary)
            return summary

    # -- queries -------------------------------------------------------------
    def wait_idle(self):
        """Block until every queued KF job (and its on_done hook) has
        finished (finishSLAM parity). queue.join() — not empty()-polling,
        which would return while the worker is mid-job."""
        if self._async:
            self._queue.join()

    def kf_poses(self) -> np.ndarray:
        with self._lock:
            n = int(self.state.n_kfs)
            return np.asarray(self.state.kf_pose[:n])

    def latest_kf_pose(self, slot: int) -> np.ndarray:
        with self._lock:
            return np.asarray(self.state.kf_pose[slot])

    def n_landmarks(self) -> Tuple[int, int]:
        with self._lock:
            return (int(jnp.sum(self.state.pt_valid)),
                    int(jnp.sum(self.state.ln_valid)))

    def close(self):
        if self._async and self._worker is not None:
            self._queue.put(None)
            self._worker.join(timeout=5.0)
            self._worker = None
