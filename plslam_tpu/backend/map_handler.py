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
                                    init_map_state, remove_redundant_kfs,
                                    remove_redundant_kfs_global)


def _compact_landmarks(valid, last_kf, start, cap: int):
    """Pick <= cap window-touched landmark slots, newest-touched first.

    The LBA window problem only ever needs landmarks observed by a window
    KF; ``last_kf >= start`` is a cheap superset of that (last_kf only
    grows). Compacting the solve onto these slots is what the reference's
    localBundleAdjustment does by construction (it optimizes the LOCAL
    map, never the full store) — and at TPU production capacities it
    shrinks every landmark-axis array in the solver ~2-4x.

    Returns (ids (cap,), sel (cap,) bool, remap (N,) -> [-1, cap),
    n_overflow)."""
    touched = valid & (last_kf >= start)
    key = jnp.where(touched, -last_kf, jnp.int32(2 ** 30))
    ids = jnp.argsort(key)[:cap].astype(jnp.int32)
    sel = touched[ids]
    n = valid.shape[0]
    remap = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(sel, ids, n)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    n_overflow = jnp.maximum(jnp.sum(touched) - cap, 0)
    return ids, sel, remap, n_overflow


def _build_window_problem(state: MapState, cam: StereoCamera,
                          cfg: SlamConfig):
    """Assemble the COMPACT window problem (window-touched landmarks
    only — see _compact_landmarks). Returns (prob, ctx) where ctx holds
    everything _apply_lba_result needs to scatter the solution back."""
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

    P = state.pt_pos.shape[0]
    Ml = state.ln_spos.shape[0]
    P_loc = min(m.lba_max_points, P)
    M_loc = min(m.lba_max_lines, Ml)

    ids_pt, sel_pt, remap_pt, pt_over = _compact_landmarks(
        state.pt_valid, state.pt_last_kf, start, P_loc)
    pt_loc = state.pt_pos[ids_pt]
    obs_pt_orig = state.obs_pt_lm[slots]
    obs_pt_id = jnp.where(obs_pt_orig >= 0,
                          remap_pt[jnp.maximum(obs_pt_orig, 0)], -1)

    ids_ln, sel_ln, remap_ln, ln_over = _compact_landmarks(
        state.ln_valid, state.ln_last_kf, start, M_loc)
    s_loc = state.ln_spos[ids_ln]
    e_loc = state.ln_epos[ids_ln]
    ep_loc = jnp.stack([s_loc, e_loc], axis=1).reshape(2 * M_loc, 3)
    ln_lm = state.obs_ln_lm[slots]
    lm_loc = jnp.where(ln_lm >= 0, remap_ln[jnp.maximum(ln_lm, 0)], -1)
    sid = jnp.where(lm_loc >= 0, 2 * lm_loc, -1)
    eid = jnp.where(lm_loc >= 0, 2 * lm_loc + 1, -1)

    prob = lba.LBAProblem(
        kf_pose=T_cw, kf_fixed=fixed, kf_valid=kf_valid,
        pt_pos=pt_loc, ep_pos=ep_loc,
        obs_pt_uv=state.obs_pt_uv[slots],
        obs_pt_disp=state.obs_pt_disp[slots],
        obs_pt_id=obs_pt_id,
        obs_ln_le=state.obs_ln_le[slots],
        obs_ln_sid=sid, obs_ln_eid=eid)
    ctx = dict(slots=slots, kf_valid=kf_valid, kf_pose_w=kf_pose_w,
               ids_pt=ids_pt, sel_pt=sel_pt, obs_pt_orig=obs_pt_orig,
               obs_pt_id=obs_pt_id, ids_ln=ids_ln, sel_ln=sel_ln,
               ln_lm=ln_lm, sid=sid, pt_over=pt_over, ln_over=ln_over,
               P_loc=P_loc, M_loc=M_loc)
    return prob, ctx


@partial(jax.jit, static_argnames=("cfg",))
def run_window_lba(state: MapState, cam: StereoCamera, cfg: SlamConfig
                   ) -> Tuple[MapState, jnp.ndarray, jnp.ndarray, dict]:
    """Build the COMPACT LBA problem from the last (window+fixed) KF
    slots (window-touched landmarks only — see _compact_landmarks), run
    robust LM, scatter results back. Returns (state, cost0, cost1, diag)."""
    prob, ctx = _build_window_problem(state, cam, cfg)
    res = lba.run_lba(prob, cam, cfg)
    return _apply_lba_result(state, res, ctx)


def _apply_lba_result(state: MapState, res, ctx
                      ) -> Tuple[MapState, jnp.ndarray, jnp.ndarray, dict]:
    """Scatter an LBAResult back into the map state (poses, landmark
    positions, outlier-observation detachment)."""
    slots = ctx["slots"]
    kf_valid = ctx["kf_valid"]
    kf_pose_w = ctx["kf_pose_w"]
    ids_pt, sel_pt = ctx["ids_pt"], ctx["sel_pt"]
    obs_pt_orig, obs_pt_id = ctx["obs_pt_orig"], ctx["obs_pt_id"]
    ids_ln, sel_ln = ctx["ids_ln"], ctx["sel_ln"]
    ln_lm, sid = ctx["ln_lm"], ctx["sid"]
    pt_over, ln_over = ctx["pt_over"], ctx["ln_over"]
    P = state.pt_pos.shape[0]
    Ml = state.ln_spos.shape[0]
    M_loc = res.ep_pos.shape[0] // 2     # static (from the array shape)

    new_pose_w = jax.vmap(lie.inverse_se3)(res.kf_pose)
    kf_pose = state.kf_pose.at[slots].set(
        jnp.where(kf_valid[:, None, None], new_pose_w, kf_pose_w))
    # scatter optimized landmark positions back to their global slots
    pt_pos = state.pt_pos.at[jnp.where(sel_pt, ids_pt, P)].set(
        res.pt_pos, mode="drop")
    eps = res.ep_pos.reshape(M_loc, 2, 3)
    lidx = jnp.where(sel_ln, ids_ln, Ml)
    ln_spos = state.ln_spos.at[lidx].set(eps[:, 0], mode="drop")
    ln_epos = state.ln_epos.at[lidx].set(eps[:, 1], mode="drop")
    # mark outlier observations (mapHandler outlier flags): detach them.
    # An obs that never entered the solve (obs_pt_id < 0: unattached OR
    # compaction overflow) must stay attached — only solved outliers go.
    obs_pt_lm = state.obs_pt_lm.at[slots].set(
        jnp.where(res.obs_pt_inlier | (obs_pt_id < 0), obs_pt_orig, -1))
    obs_ln_lm = state.obs_ln_lm.at[slots].set(
        jnp.where(res.obs_ln_inlier | (sid < 0), ln_lm, -1))
    new_state = state._replace(kf_pose=kf_pose, pt_pos=pt_pos,
                               ln_spos=ln_spos, ln_epos=ln_epos,
                               obs_pt_lm=obs_pt_lm, obs_ln_lm=obs_ln_lm)
    diag = {"lba_pt_overflow": pt_over, "lba_ln_overflow": ln_over}
    return new_state, res.cost0, res.cost1, diag


class DistLBA:
    """Live-system distributed-LBA context: the device mesh + the jitted
    owner-sharded LM program (parallel.dist_lba.make_dist_lba_lm) + the
    jitted problem builder. Built once per MapHandler/driver when
    ``mapping.distributed`` is set (SURVEY §2.3 P5 — the reference has
    no distributed story; this is the TPU build's own north star)."""

    def __init__(self, cfg: SlamConfig, cam: StereoCamera, mesh=None):
        from plslam_tpu.parallel.dist_lba import make_dist_lba_lm
        from plslam_tpu.parallel.mesh import make_mesh
        if mesh is None:
            n = cfg.mapping.dist_devices or len(jax.devices())
            mesh = make_mesh(n, axes=("lm",))
        self.mesh = mesh
        self.n = int(np.prod(list(mesh.shape.values())))
        self.lm_fn = make_dist_lba_lm(
            mesh, cam, cfg.mapping.lba_iters, cfg.mapping.lambda_init,
            cfg.mapping.lambda_factor, axis="lm")
        self._build = jax.jit(_build_window_problem,
                              static_argnames=("cfg",))
        self._posthoc = jax.jit(lba.posthoc_inliers,
                                static_argnames=("cfg",))
        self._apply = jax.jit(_apply_lba_result)


def run_window_lba_distributed(state: MapState, cam: StereoCamera,
                               cfg: SlamConfig, dist: DistLBA
                               ) -> Tuple[MapState, jnp.ndarray,
                                          jnp.ndarray, dict]:
    """run_window_lba with the solve routed through the owner-sharded
    multi-device LM program: build the compact window problem, bucket it
    into the round-robin owner layout, solve across the mesh (the only
    collectives are the ~16 KB reduced camera system per iteration),
    gather the sharded landmark solution back, flag outliers on the full
    layout, scatter into the map state."""
    from plslam_tpu.parallel.dist_lba import bucket_problem_by_owner
    prob, ctx = dist._build(state, cam, cfg)
    bucketed = bucket_problem_by_owner(prob, dist.n)
    kf_pose, pt_b, ep_b, c0, c1 = dist.lm_fn(bucketed.problem)
    pt_pos = pt_b[bucketed.pt_perm]
    ep_pos = ep_b[bucketed.ep_perm]
    solved = prob._replace(kf_pose=kf_pose, pt_pos=pt_pos, ep_pos=ep_pos)
    pt_inl, ln_inl = dist._posthoc(solved, cam, cfg)
    res = lba.LBAResult(kf_pose, pt_pos, ep_pos, c0, c1, pt_inl, ln_inl)
    return dist._apply(state, res, ctx)


def mapping_step_distributed(state: MapState, pts, lns, T_w_kf,
                             cam: StereoCamera, cfg: SlamConfig,
                             dist: DistLBA, run_lba_flag: bool = True):
    """mapping_step with the window LBA on the device mesh. Host-side
    composition of the jitted pieces (insertion, sharded LBA,
    retirement, culling) — the sharded program cannot live inside the
    single-device fused step, and on a pod the extra dispatches amortize
    against the multi-chip solve."""
    state, diag = add_keyframe(state, pts, lns, T_w_kf, cam, cfg)
    c0 = c1 = jnp.asarray(0.0)
    if run_lba_flag:
        state, c0, c1, lba_diag = run_window_lba_distributed(
            state, cam, cfg, dist)
        diag = {**diag, **lba_diag}
        state, _ = remove_redundant_kfs(state, cfg)
        if cfg.mapping.global_kf_sweep_every > 0:
            # unconditional here (the jitted cadence test lives in
            # mapping_step; an extra sweep is idempotent)
            state = remove_redundant_kfs_global(state, cfg)[0]
    state = cull_landmarks(state, cfg)
    return state, diag, c0, c1


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
        state, c0, c1, lba_diag = run_window_lba(state, cam, cfg)
        diag = {**diag, **lba_diag}
        state, _ = remove_redundant_kfs(state, cfg)
        every = cfg.mapping.global_kf_sweep_every
        if every > 0:
            # periodic GLOBAL sweep: old redundant KFs outside the window
            # are retired too (removeRedundantKFs scans covisible KFs
            # globally in the reference)
            state = jax.lax.cond(
                jnp.mod(state.n_kfs, every) == 0,
                lambda s: remove_redundant_kfs_global(s, cfg)[0],
                lambda s: s, state)
    state = cull_landmarks(state, cfg)
    return state, diag, c0, c1


def mapping_step_traced_lba(state: MapState, pts, lns, T_w_kf,
                            cam: StereoCamera, cfg: SlamConfig,
                            lba_flag):
    """mapping_step with a TRACED LBA flag: KF insertion always runs;
    the LBA + KF-retirement block runs under ``lax.cond(lba_flag)``.

    This backs the strided-LBA mode (MappingConfig.lba_kf_stride): the
    fused chunk back-end inserts every keyframe of a chunk but runs the
    window LBA only on every Nth one counted from the chunk's end (the
    last always solves), so the window still covers every insertion
    while the LBA count drops ~Nx (the reference, with a free CPU
    thread, re-solves per KF: mapHandler.cpp::localBundleAdjustment).

    Returns (state, diag, c0, c1, pt_overflow, ln_overflow)."""
    state, diag = add_keyframe(state, pts, lns, T_w_kf, cam, cfg)

    def with_lba(s):
        s, c0, c1, lba_diag = run_window_lba(s, cam, cfg)
        s, _ = remove_redundant_kfs(s, cfg)
        every = cfg.mapping.global_kf_sweep_every
        if every > 0:
            # this branch only runs on LBA slots — with lba_kf_stride>1
            # those are up to ``stride`` KFs apart, so an exact ==0 test
            # can skip multiples of ``every`` entirely and starve the
            # global sweep; fire when a boundary fell anywhere in the
            # last ``stride`` insertions instead (cadence independent of
            # the LBA stride; stride 1 reduces to the exact test)
            stride = max(int(cfg.mapping.lba_kf_stride), 1)
            s = jax.lax.cond(
                jnp.mod(s.n_kfs, every) < stride,
                lambda x: remove_redundant_kfs_global(x, cfg)[0],
                lambda x: x, s)
        f32 = jnp.float32
        return (s, jnp.asarray(c0, f32), jnp.asarray(c1, f32),
                jnp.asarray(lba_diag.get("lba_pt_overflow", 0), jnp.int32),
                jnp.asarray(lba_diag.get("lba_ln_overflow", 0), jnp.int32))

    def no_lba(s):
        z = jnp.asarray(0.0, jnp.float32)
        zi = jnp.asarray(0, jnp.int32)
        return s, z, z, zi, zi

    state, c0, c1, pt_ov, ln_ov = jax.lax.cond(
        lba_flag, with_lba, no_lba, state)
    state = cull_landmarks(state, cfg)
    return state, diag, c0, c1, pt_ov, ln_ov


class KeyFrameSummary(NamedTuple):
    slot: int
    T_w_kf: np.ndarray          # corrected pose after LBA
    n_map_matches: int
    n_new_points: int
    lba_cost0: float
    lba_cost1: float
    lba_pt_overflow: int = 0    # window obs dropped by LBA compaction
    lba_ln_overflow: int = 0    # (never silent — see MappingConfig)


class PendingSummary(NamedTuple):
    """A KF summary whose scalars still live on device. The mapping
    worker shares the chip's execution stream with tracking, and on
    tunnel-attached runtimes every device_get is a ~25-40 ms round
    trip — so in async mode the per-KF fetch is deferred until someone
    actually reads ``summaries`` (the loop closer's on_done hook only
    needs ``slot``, which is host-known)."""
    slot: int
    refs: tuple                 # device arrays, see _materialize


class PendingBatch(NamedTuple):
    """Deferred summaries of one fused chunk-backend dispatch."""
    slots: tuple                # host ints (valid KFs only)
    refs: tuple                 # (poses (kmax,4,4), stats (kmax,6))


def _materialize(slot: int, refs) -> KeyFrameSummary:
    refs = jax.device_get(refs)
    return KeyFrameSummary(
        slot=slot, T_w_kf=np.asarray(refs[0]),
        n_map_matches=int(refs[1]), n_new_points=int(refs[2]),
        lba_cost0=float(refs[3]), lba_cost1=float(refs[4]),
        lba_pt_overflow=int(refs[5]), lba_ln_overflow=int(refs[6]))


def _materialize_batch(slots, refs):
    poses, stats = jax.device_get(refs)
    return [KeyFrameSummary(
        slot=s, T_w_kf=np.asarray(poses[j]),
        n_map_matches=int(stats[j, 2]), n_new_points=int(stats[j, 3]),
        lba_cost0=float(stats[j, 0]), lba_cost1=float(stats[j, 1]),
        lba_pt_overflow=int(stats[j, 4]), lba_ln_overflow=int(stats[j, 5]))
        for j, s in enumerate(slots)]


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
        self._dist = (DistLBA(cfg, cam) if cfg.mapping.distributed
                      else None)
        self._records = []          # KeyFrameSummary | PendingSummary
        self._next_slot = 0
        self._lock = threading.Lock()
        self._async = cfg.system.async_mapping
        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._fused = None          # lazily-built fused chunk-backend step
        self._fused_probe_on = None
        # dispatch handshake (see wait_dispatched)
        self._disp_cv = threading.Condition()
        self._jobs_submitted = 0
        self._jobs_dispatched = 0
        if self._async:
            self._worker = threading.Thread(target=self._work_loop, daemon=True)
            self._worker.start()

    # -- keyframe ingestion --------------------------------------------------
    def add_keyframe(self, pts, lns, T_w_kf: np.ndarray, run_lba: bool = True,
                     on_done=None) -> Optional[KeyFrameSummary]:
        """``on_done(record)`` runs after the KF is processed — on the
        worker thread in async mode (so e.g. loop-closure checks ride the
        mapping thread instead of blocking the tracker), inline in sync
        mode. The record is a KeyFrameSummary in sync mode and a
        fetch-free PendingSummary (``.slot`` only) in async mode."""
        if self._async:
            self._queue.put(("kf", pts, lns, np.asarray(T_w_kf), run_lba,
                             on_done))
            return None
        summary = self._process(pts, lns, T_w_kf, run_lba)
        if on_done is not None:
            on_done(summary)
        return summary

    def add_keyframes_fused(self, all_pts, all_lns, frame_idx, T_rels,
                            loop_closer=None) -> None:
        """Process a chunk's keyframes as fused device dispatches (see
        backend.chunk_backend): ONE program + ONE fetch per <=kf_batch
        KFs instead of ~5 dispatches per KF. ``all_pts``/``all_lns`` are
        the chunk's device-resident stacked features (packed descriptors,
        batch_vo ``keep_feats``); ``frame_idx`` selects the KF frames and
        ``T_rels[j]`` is KF j's tracker pose RELATIVE to the previous KF
        (composed in-program against the previous KF's current corrected
        pose — delayed correction pickup). When ``loop_closer`` is given,
        the BoW probe rides the same program and its host logic (edges/
        votes/closures) runs on the worker from one batched fetch."""
        job = ("batch", all_pts, all_lns, list(frame_idx),
               [np.asarray(T, np.float32) for T in T_rels], loop_closer)
        if self._async:
            with self._disp_cv:
                self._jobs_submitted += 1
            self._queue.put(job)
            return
        self._process_batch(*job[1:])

    def _work_loop(self):
        """Pipelined worker: a batch job's device program is dispatched
        immediately, but its probe HANDLING (the blocking fetch + loop
        host logic) is deferred while more jobs are queued — so batch
        k's fetch overlaps batch k+1's (and the tracker's) device
        execution instead of serializing behind it. Probe handling stays
        strictly ordered; a closure therefore applies at most one job
        later than in the unpipelined flow (same class of delay as the
        reference's mapping-thread pickup)."""
        pending = []          # deferred probe entries, ordered
        while True:
            if pending:
                try:
                    job = self._queue.get_nowait()
                except queue.Empty:
                    self._flush_probes(pending)
                    continue
            else:
                job = self._queue.get()
            if job is None:
                self._flush_probes(pending)
                self._queue.task_done()
                return
            try:
                if job[0] == "kf":
                    self._flush_probes(pending)   # keep strict KF order
                    summary = self._process(*job[1:5])
                    if job[5] is not None:
                        job[5](summary)
                    self._queue.task_done()
                else:
                    # adaptive: while closures are firing, revert to the
                    # strict interleave (corrections must land before the
                    # next insertions); otherwise pipeline the fetches —
                    # several dispatched batches drain in ONE fetch
                    lc = job[5]
                    eager = (lc is not None
                             and getattr(lc, "closure_imminent", False))
                    if eager:
                        self._flush_probes(pending)
                        self._dispatch_batch(
                            *job[1:], handler=self._handle_probe_entry,
                            granularity=2)
                        self._mark_dispatched()
                        self._queue.task_done()
                    else:
                        pending.extend(self._dispatch_batch(*job[1:]))
                        self._mark_dispatched()
                        if len(pending) >= 3:     # bound pipeline depth
                            self._flush_probes(pending)
            except Exception as e:  # surfaced via summaries
                print(f"[map_handler] worker error: {e!r}")
                if job[0] != "kf":
                    self._mark_dispatched()
                self._queue.task_done()

    def _mark_dispatched(self):
        with self._disp_cv:
            self._jobs_dispatched += 1
            self._disp_cv.notify_all()

    def wait_dispatched(self, timeout: float = 30.0) -> None:
        """Block until every submitted batch job's device programs have
        been DISPATCHED (their fetches may still be pending). The chunked
        tracker calls this before submitting the next chunk so the
        back-end's programs interleave with the tracking chunks in the
        device stream — otherwise the worker's programs land behind
        several future chunks and every probe fetch pays a multi-chunk
        stream wait."""
        if not self._async:
            return
        import time as _time
        deadline = _time.monotonic() + timeout
        with self._disp_cv:
            while self._jobs_dispatched < self._jobs_submitted:
                if not self._disp_cv.wait(timeout=0.2):
                    if (_time.monotonic() > deadline
                            or self._worker is None
                            or not self._worker.is_alive()):
                        return

    def _flush_probes(self, pending):
        """Handle every deferred probe entry with ONE batched fetch."""
        if not pending:
            return
        entries, n_done = list(pending), 0
        pending.clear()
        try:
            lc = entries[0][4]
            if lc is not None:
                lc.on_probe_batches(
                    self, [(e[0], e[1], e[2], e[3]) for e in entries])
        except Exception as e:
            print(f"[map_handler] probe error: {e!r}")
        finally:
            for e in entries:
                if e[5]:
                    self._queue.task_done()

    def _handle_probe_entry(self, entry):
        slots, scores, covis, poses, loop_closer, last_of_job = entry
        try:
            if loop_closer is not None:
                loop_closer.on_probe_batch(self, slots, scores, covis,
                                           poses)
        except Exception as e:
            print(f"[map_handler] probe error: {e!r}")
        finally:
            if last_of_job:
                self._queue.task_done()

    def _check_capacity(self, n_new: int = 1) -> None:
        """Loud failure instead of the silent scatter-clamp corruption a
        full KF array would cause. The fused driver (FusedPLSLAM)
        additionally recycles retired slots via compaction; this worker
        -thread path fails fast with guidance."""
        if self._next_slot + n_new > self.cfg.mapping.max_kfs:
            raise RuntimeError(
                f"KF capacity exhausted: slot {self._next_slot} + "
                f"{n_new} > mapping.max_kfs={self.cfg.mapping.max_kfs}. "
                "Raise mapping.max_kfs, or use the fused driver "
                "(system.fused_slam=True), which compacts retired "
                "keyframe slots for unbounded sequences.")

    def _process(self, pts, lns, T_w_kf, run_lba_flag):
        self._check_capacity(1)
        with self._lock:
            if self._dist is not None:
                state, diag, c0, c1 = mapping_step_distributed(
                    self.state, pts, lns,
                    jnp.asarray(T_w_kf, jnp.float32), self.cam, self.cfg,
                    self._dist, run_lba_flag=bool(run_lba_flag))
            else:
                state, diag, c0, c1 = mapping_step(
                    self.state, pts, lns, jnp.asarray(T_w_kf, jnp.float32),
                    self.cam, self.cfg, run_lba_flag=bool(run_lba_flag))
            self.state = state
            slot = self._next_slot
            self._next_slot += 1
            refs = (jnp.take(state.kf_pose, diag["kf_slot"], axis=0),
                    diag["n_map_matches"], diag["n_new_points"], c0, c1,
                    diag.get("lba_pt_overflow", 0),
                    diag.get("lba_ln_overflow", 0))
            if self._async:
                # no host fetch on the worker's hot path (see PendingSummary)
                rec = PendingSummary(slot, refs)
            else:
                rec = _materialize(slot, refs)
            self._records.append(rec)
            return rec

    def _get_fused(self, loop_closer):
        probe_on = loop_closer is not None
        if self._fused is None or self._fused_probe_on != probe_on:
            from plslam_tpu.backend.chunk_backend import make_chunk_backend
            voc_p = loop_closer.db.voc_p if probe_on else None
            voc_l = loop_closer.db.voc_l if probe_on else None
            self._fused = make_chunk_backend(
                self.cam, self.cfg, self.cfg.system.kf_batch, voc_p, voc_l)
            self._fused_probe_on = probe_on
        return self._fused

    def _dispatch_batch(self, all_pts, all_lns, frame_idx, T_list,
                        loop_closer, handler=None, granularity=None):
        """Dispatch the fused program(s) for one batch job. With
        ``handler``, each sub-batch's probe entry is handled inline
        BEFORE the next sub-batch dispatches (a fired loop correction
        lands before later KFs anchor their windows to stale poses);
        without it, entries are returned for deferred (pipelined)
        handling. ``granularity`` < kf_batch splits into smaller (padded)
        sub-batches — used in closure-imminent mode, where correction
        ordering matters more than fetch economy."""
        kmax = self.cfg.system.kf_batch
        g = min(granularity or kmax, kmax)
        self._check_capacity(len(frame_idx))
        fused = self._get_fused(loop_closer)
        dummy = jnp.zeros((1, 1), jnp.float32)
        entries = []
        for off in range(0, len(frame_idx), g):
            sub_i = frame_idx[off:off + g]
            sub_T = T_list[off:off + g]
            n = len(sub_i)
            meta = np.zeros((kmax, 18), np.float32)
            meta[:n, 0] = sub_i
            meta[:n, 1] = 1.0
            meta[:, 2:] = np.eye(4, dtype=np.float32).reshape(-1)
            meta[:n, 2:] = np.stack(sub_T).reshape(n, 16)
            meta = jnp.asarray(meta)     # one packed transfer
            with self._lock:
                if loop_closer is not None:
                    bows_p, bows_l = loop_closer.db.bows_p, loop_closer.db.bows_l
                    if bows_l is None:
                        bows_l = dummy
                else:
                    bows_p = bows_l = dummy
                (state, bp, bl, scores, covis, poses, stats) = fused(
                    self.state, bows_p, bows_l, all_pts, all_lns, meta)
                self.state = state
                if loop_closer is not None:
                    loop_closer.db.bows_p = bp
                    if loop_closer.db.bows_l is not None:
                        loop_closer.db.bows_l = bl
                slots = tuple(range(self._next_slot, self._next_slot + n))
                self._next_slot += n
                self._records.append(PendingBatch(slots, (poses, stats)))
            entry = [slots, scores, covis, poses, loop_closer, False]
            if handler is not None:
                handler(entry)
            else:
                entries.append(entry)
        if entries:
            entries[-1][-1] = True      # task_done after the last entry
        return entries

    def _process_batch(self, all_pts, all_lns, frame_idx, T_list,
                       loop_closer):
        """Sync-mode batch processing: each sub-batch's probes handled
        inline, interleaved with the dispatches (fine granularity when
        loops are on, so corrections land between insertions)."""
        def handle(entry):
            slots, scores, covis, poses, lc, _ = entry
            if lc is not None:
                lc.on_probe_batch(self, slots, scores, covis, poses)
        self._dispatch_batch(all_pts, all_lns, frame_idx, T_list,
                             loop_closer, handler=handle,
                             granularity=2 if loop_closer else None)

    @property
    def summaries(self):
        """Per-KF summaries, materialized on access (one batched fetch
        for everything still pending)."""
        with self._lock:
            out = []
            for i, r in enumerate(self._records):
                if isinstance(r, PendingSummary):
                    self._records[i] = r = _materialize(r.slot, r.refs)
                elif isinstance(r, PendingBatch):
                    self._records[i] = r = _materialize_batch(r.slots, r.refs)
                out.extend(r if isinstance(r, list) else [r])
            return out

    # -- queries -------------------------------------------------------------
    def backlog(self) -> int:
        """Jobs queued-or-running on the mapping worker (0 in sync mode).
        The chunked driver uses this for backpressure: if the tracker
        keeps enqueueing chunks while the worker lags, the worker's
        programs land ever later in the device stream, its fetches wait
        ever longer, and the whole backlog drains serially in finish()."""
        return self._queue.unfinished_tasks if self._async else 0

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
