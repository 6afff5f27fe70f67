"""Fully-fused full-SLAM chunks: ONE device program per B-frame chunk.

The chunked driver (backend.slam_system.ChunkedPLSLAM) still makes the
keyframe decision on host: it must FETCH every chunk's per-frame
covariances before the back-end program can even be dispatched, and on
tunnel-attached TPU runtimes a single device fetch can stall for
seconds when the link degrades (measured on this rig: the same 64 KB
fetch ranges 0.2 ms .. 4500 ms). Full-SLAM throughput was therefore
hostage to fetch latency even though the device work per chunk is
~10 ms.

This module moves the LAST host decision into the program: the keyframe
criterion (stereoFrameHandler::currFrameIsKF — covariance-entropy ratio
of the adjoint-compounded motion since the last KF, plus translation/
rotation caps) runs as a ``lax.scan`` over the chunk's tracked frames,
and its selected keyframes feed the fused back-end (insertion + map
matching + triangulation + Schur LBA + culling + BoW probe,
backend.chunk_backend.backend_slots) IN THE SAME PROGRAM. Per chunk the
host dispatches exactly one program and fetches exactly one packed
result buffer (a few KB) — two chunks ride in flight, so a stalled
fetch overlaps the next chunk's device execution, and NO host round
trip sits between tracking and mapping.

Loop-closure candidate selection/voting stays on host (it consumes the
fetched probe scores); verification + pose-graph + correction dispatch
extra programs only when a candidate actually fires (rare). While the
voter reports a streak building, the driver drops to depth-1 pipelining
so corrections land before the next chunk's insertions — the same
adaptive ordering the worker-thread driver uses.

Reference parity note: this collapses what the reference runs as two
threads (tracking + mapping, mapHandler queue) into one device stream
with host-side pipelining — the TPU-native equivalent of P3 for the
single-chip deployment; the worker-thread path remains available in
ChunkedPLSLAM.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.backend.chunk_backend import backend_slots
from plslam_tpu.backend.map import init_map_state
from plslam_tpu.backend.map_handler import KeyFrameSummary, mapping_step
from plslam_tpu.frontend.stereo_frame import extract_stereo_frame
from plslam_tpu.tracking.batch_vo import _chunk_tracking_batched


class CritCarry(NamedTuple):
    """Device-resident keyframe-criterion state (KeyframeCriterion
    parity, crossing chunk boundaries as program carries)."""
    cov_kf: jnp.ndarray      # (6, 6) compounded covariance since last KF
    have_cov: jnp.ndarray    # () bool — cov_kf holds data
    ef: jnp.ndarray          # () entropy at first post-KF frame
    have_ef: jnp.ndarray     # () bool
    frames: jnp.ndarray      # () int32 frames since last KF
    T_acc: jnp.ndarray       # (4, 4) pose of current frame rel. last KF
    last_step: jnp.ndarray   # (4, 4) last good relative step (fallback)


def init_crit_carry() -> CritCarry:
    return CritCarry(
        cov_kf=jnp.zeros((6, 6), jnp.float32),
        have_cov=jnp.asarray(False),
        ef=jnp.asarray(0.0, jnp.float32),
        have_ef=jnp.asarray(False),
        frames=jnp.asarray(0, jnp.int32),
        T_acc=jnp.eye(4, dtype=jnp.float32),
        last_step=jnp.eye(4, dtype=jnp.float32))


def kf_scan(DT: jnp.ndarray, cov: jnp.ndarray, good: jnp.ndarray,
            carry: CritCarry, cfg: SlamConfig, kmax: int):
    """currFrameIsKF as an in-program scan over a tracked chunk.

    Mirrors tracking.frame_handler.KeyframeCriterion.update exactly
    (adjoint compounding of the RAW per-pair covariances, entropy ratio
    vs the first post-KF frame, t/r caps, min_kf_n_frames), with one
    bounded deviation: at most ``kmax`` keyframes fire per chunk — a
    further candidate frame keeps accumulating and fires on the next
    chunk instead (the criterion state is NOT reset), so no keyframe is
    lost, only deferred by < one chunk.

    Returns (flags (B,), T_accs (B,4,4) pose of each frame relative to
    its preceding KF, ratios (B,), blocked (B,) — frames whose fire was
    deferred by the kmax cap — and carry_out)."""
    k = cfg.keyframe
    r_cap = np.deg2rad(k.max_kf_r_dist).astype(np.float32)

    def body(c, x):
        DT_i, cov_i, good_i = x
        c, n_fired = c
        step = jnp.where(good_i, DT_i, c.last_step)
        Adj = lie.adjoint_se3(DT_i)
        cov_new = jnp.where(
            c.have_cov,
            lie.mm(lie.mm(Adj, c.cov_kf), Adj.T) + cov_i, cov_i)
        sign, logdet = jnp.linalg.slogdet(cov_new)
        h = jnp.where(sign > 0, 0.5 * logdet, -jnp.inf)
        ef_new = jnp.where(c.have_ef, c.ef, h)
        ratio = jnp.where(ef_new != 0.0, h / ef_new, 1.0)
        T_acc = lie.mm(c.T_acc, lie.inverse_se3(step))
        t_dist, r_dist = lie.se3_distance(T_acc)
        frames = c.frames + 1
        crit = ((ratio < k.min_entropy_ratio) | (t_dist > k.max_kf_t_dist)
                | (r_dist > r_cap))
        want = good_i & (frames >= k.min_kf_n_frames) & crit
        is_kf = want & (n_fired < kmax)
        blocked = want & (n_fired >= kmax)   # cap bound: KF deferred
        eye4 = jnp.eye(4, dtype=jnp.float32)
        c2 = CritCarry(
            cov_kf=cov_new,
            have_cov=~is_kf,
            ef=jnp.where(is_kf, 0.0, ef_new),
            have_ef=jnp.where(is_kf, False, True),
            frames=jnp.where(is_kf, 0, frames),
            T_acc=jnp.where(is_kf, eye4, T_acc),
            last_step=step)
        return (c2, n_fired + is_kf.astype(jnp.int32)), (is_kf, T_acc,
                                                         ratio, blocked)

    (carry_out, _), (flags, T_accs, ratios, blocked) = lax.scan(
        body, (carry, jnp.asarray(0, jnp.int32)), (DT, cov, good))
    return flags, T_accs, ratios, blocked, carry_out


# packed host-block layout — ONE flat f32 buffer per chunk, so the
# settle is a single one-buffer fetch (this rig's tunnel charges
# erratic per-transfer latency, so buffer COUNT matters more than bytes):
#   per frame (B rows x PF):  [DT flat 16 | T_acc flat 16 | good | flag |
#                              n_inliers | err | ratio | blocked]
#   per slot (kmax rows x PS): [valid | frame_idx | pose flat 16 | stats 7]
#   (stats[6] is the DEVICE-side KF slot — authoritative numbering, since
#    chunk k+1 is submitted before chunk k settles)
#   then scores (kmax*F) | covis (kmax*F) | kf_pose snapshot (F*16)
_PF = 38
_PS = 25


_STEP_CACHE: dict = {}
_STEP_CACHE_MAX = 8


def make_fused_slam_step(cam: StereoCamera, cfg: SlamConfig, kmax: int,
                         voc_p=None, voc_l=None):
    """Build (or fetch from the process-level cache) the jitted
    one-dispatch-per-chunk SLAM step.

    fn(imgs (2, B, H, W) stacked L/R, prev_pts, prev_lns, T_prior0,
       crit, state, bows_p, bows_l) ->
    (host_blk, state, bows_p, bows_l, crit, last_pts, last_lns, DT_next)

    Caching matters operationally: tracing + lowering this program costs
    ~10-15 s on this rig even with a warm persistent XLA compile cache,
    and a fresh ``@jax.jit`` closure per driver instance pays it again.
    Keyed by config + camera values + the vocabularies' stable
    ``origin`` identity (artifact path + size/mtime, or a build
    digest) — never ``id()``, which a GC'd-and-reallocated Vocabulary
    could alias onto a program traced for different constants. Bounded
    FIFO (a long-lived process sweeping configs must not retain one
    compiled program per config forever)."""
    vkey = lambda v: (None if v is None
                      else (v.origin or ("anon", id(v), v.k, v.levels)))
    key = (cfg, kmax,
           float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
           float(cam.b), cam.width, cam.height,
           vkey(voc_p), vkey(voc_l))
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit
    while len(_STEP_CACHE) >= _STEP_CACHE_MAX:
        _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
    probe = None
    if voc_p is not None:
        from plslam_tpu.loop.loop_closer import probe_core
        probe = partial(probe_core, voc_p, voc_l, cfg, cfg.lines.has_lines)

    @jax.jit
    def step(imgs, prev_pts, prev_lns, T_prior0,
             crit: CritCarry, state, bows_p, bows_l):
        imgs_l, imgs_r = imgs[0], imgs[1]
        if imgs_l.dtype == jnp.uint8:
            imgs_l = imgs_l.astype(jnp.float32) * (1.0 / 255.0)
            imgs_r = imgs_r.astype(jnp.float32) * (1.0 / 255.0)
        pts, lns = jax.vmap(
            lambda a, b: extract_stereo_frame(a, b, cam, cfg))(imgs_l, imgs_r)
        out = _chunk_tracking_batched(pts, lns, prev_pts, prev_lns,
                                      T_prior0, cam, cfg, keep_feats=False)
        B = out.DT.shape[0]
        flags, T_accs, ratios, blocked, crit2 = kf_scan(
            out.DT, out.cov, out.good, crit, cfg, kmax)

        # compress flagged frames into kmax back-end slots
        order = jnp.cumsum(flags.astype(jnp.int32)) - 1      # kf index
        sel = flags & (order < kmax)
        tgt = jnp.where(sel, order, kmax)
        i32 = jnp.int32
        frame_idx = jnp.zeros((kmax + 1,), i32).at[tgt].set(
            jnp.arange(B, dtype=i32), mode="drop")[:kmax]
        kf_valid = jnp.zeros((kmax + 1,), bool).at[tgt].set(
            True, mode="drop")[:kmax]
        T_rels = jnp.tile(jnp.eye(4, dtype=jnp.float32), (kmax + 1, 1, 1)
                          ).at[tgt].set(T_accs, mode="drop")[:kmax]

        state, bows_p, bows_l, scores, covis, poses, stats = backend_slots(
            state, bows_p, bows_l, pts, lns, frame_idx, kf_valid, T_rels,
            cam, cfg, kmax, probe=probe, packed_desc=False)

        f32 = jnp.float32
        frame_blk = jnp.concatenate([
            out.DT.reshape(B, 16).astype(f32),
            T_accs.reshape(B, 16).astype(f32),
            out.good.astype(f32)[:, None],
            flags.astype(f32)[:, None],
            out.n_inliers.astype(f32)[:, None],
            out.err.astype(f32)[:, None],
            ratios.astype(f32)[:, None],
            blocked.astype(f32)[:, None]], axis=1)          # (B, _PF)
        slot_blk = jnp.concatenate([
            kf_valid.astype(f32)[:, None],
            frame_idx.astype(f32)[:, None],
            poses.reshape(kmax, 16).astype(f32),
            stats.astype(f32)], axis=1)                     # (kmax, _PS)
        host_blk = jnp.concatenate(
            [frame_blk.reshape(-1), slot_blk.reshape(-1),
             scores.reshape(-1).astype(f32), covis.reshape(-1).astype(f32),
             state.kf_pose.reshape(-1).astype(f32)])
        last_p = jax.tree_util.tree_map(lambda x: x[-1], pts)
        last_l = (jax.tree_util.tree_map(lambda x: x[-1], lns)
                  if lns is not None else None)
        return (host_blk, state, bows_p, bows_l, crit2,
                last_p, last_l, out.DT_next)

    _STEP_CACHE[key] = step
    return step


class _PendingChunk(NamedTuple):
    host_ref: jnp.ndarray      # the single packed output buffer (device ref)
    n_valid: Optional[int]


class _PendingUpload(NamedTuple):
    fut: "Future"              # resolves to the stacked (2,B,H,W) device ref
    n_valid: Optional[int]


class FusedPLSLAM:
    """Single-dispatch-per-chunk full SLAM driver (see module docstring).

    API-compatible with ChunkedPLSLAM: initialize / process_chunk /
    online_pose / finish, plus ``summaries`` and ``loop_closer``.
    """

    def __init__(self, cfg: SlamConfig, cam: Optional[StereoCamera] = None,
                 enable_loops: Optional[bool] = None):
        self.cfg = cfg
        self.cam = cam if cam is not None else StereoCamera.from_config(cfg.camera)
        self.kmax = cfg.system.kf_batch
        self.enable_loops = (cfg.loop.enabled if enable_loops is None
                             else enable_loops)
        # loop-closer compatibility surface (it treats us as MapHandler)
        self._lock = threading.Lock()
        self.state = init_map_state(cfg)
        self._next_slot = 0
        self.loop_closer = None
        voc_p = voc_l = None
        if self.enable_loops:
            from plslam_tpu.loop.loop_closer import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.cam)
            voc_p = self.loop_closer.db.voc_p
            voc_l = self.loop_closer.db.voc_l
        self._step = make_fused_slam_step(self.cam, cfg, self.kmax,
                                          voc_p, voc_l)
        # dedicated upload thread: on tunnel-attached runtimes
        # jax.device_put BLOCKS the calling thread with erratic latency
        # (measured 7-600 ms for the same 9 MB chunk); keeping it off
        # the dispatch thread lets uploads overlap program execution
        # and host settle work. One stacked (2,B,H,W) array per chunk =
        # ONE transfer instead of two (per-transfer latency dominates).
        self._pool = ThreadPoolExecutor(1, thread_name_prefix="plslam-upload")
        self._upload_q: List[_PendingUpload] = []
        self._dummy_bows = jnp.zeros((1, 1), jnp.float32)
        self._crit = init_crit_carry()
        self.prev_pts = None
        self.prev_lns = None
        self.DT_prev = jnp.eye(4, dtype=jnp.float32)
        self.trajectory: List[np.ndarray] = []
        self._frame_anchor: List[Tuple[int, np.ndarray]] = []
        self._kf_slot = -1
        self._records: List[KeyFrameSummary] = []
        self._pending: List[_PendingChunk] = []
        self._last_step_host = np.eye(4, dtype=np.float32)
        self._T_wc = np.eye(4, dtype=np.float32)
        self._last_settled = None   # (kf_poses, last anchor) for online_pose
        self._compacting = False
        self.n_compactions = 0      # telemetry
        self.n_kf_deferral_chunks = 0   # chunks where kf_batch bound
        self.n_evicted_kfs = 0      # non-redundant KFs lost to pressure
        # (frame_count, [evicted slot ids]) per forced-eviction event —
        # eviction deletes NON-redundant map history (accuracy loss), so
        # it is surfaced like KF deferral, not buried in n_compactions
        self.eviction_events: List[Tuple[int, List[int]]] = []

    # -- MapHandler-compat shims (used by LoopCloser) ------------------------
    def wait_idle(self):
        pass

    def wait_dispatched(self):
        pass

    # -- lifecycle -----------------------------------------------------------
    def initialize(self, img_l: np.ndarray, img_r: np.ndarray) -> None:
        from plslam_tpu.tracking.batch_vo import extract_one
        self.prev_pts, self.prev_lns = extract_one(
            jnp.asarray(img_l), jnp.asarray(img_r), self.cam, self.cfg)
        self.state, _, _, _ = mapping_step(
            self.state, self.prev_pts, self.prev_lns,
            jnp.eye(4, dtype=jnp.float32), self.cam, self.cfg,
            run_lba_flag=False)
        self._next_slot = 1
        self._kf_slot = 0
        self.trajectory = [np.eye(4, dtype=np.float32)]
        self._frame_anchor = [(0, np.eye(4, dtype=np.float32))]
        if self.loop_closer is not None:
            self.loop_closer.on_keyframe(self, 0)

    def process_chunk(self, imgs_l, imgs_r=None,
                      n_valid: Optional[int] = None) -> None:
        """Queue a (B, H, W) stereo chunk. Three pipeline stages ride
        concurrently: the upload thread pushes chunk k+1's images while
        chunk k's program executes and chunk k-1's packed result is
        settled (depth-2 program pipelining).

        ``imgs_l`` may instead be a DEVICE-RESIDENT stacked (2, B, H, W)
        array (``imgs_r=None``): an ingest pipeline that already owns a
        device buffer (prefetcher, decode-on-device, a previous stage's
        output) skips the upload thread entirely. On this rig that is
        also the only fast path once any device fetch has happened: the
        tunnel's H2D bandwidth collapses from ~1.5 GB/s to ~35 MB/s
        after the first D2H (measured, tools/bench_upload.py +
        BASELINE.md), so streaming uploads cost ~0.5 s per 18 MB chunk
        while pre-poison staging costs ~12 ms.

        Unlike the worker-thread driver, no strict-ordering fallback is
        needed around loop closures: every state mutation (chunk
        programs, corrections) is dispatched from this thread in stream
        order, so an in-flight chunk's insertions are composed against
        the exact pre-correction state they executed on and the
        correction moves them coherently afterwards. A closure merely
        fires up to one chunk later than in depth-1 mode — the same
        bounded delay as the reference's mapping-thread pickup."""
        if imgs_r is None:
            fut: "Future" = Future()
            fut.set_result(imgs_l)      # already a (2, B, H, W) device ref
            self._upload_q.append(_PendingUpload(fut, n_valid))
        else:
            # the host-side stack copy happens HERE (caller thread) so the
            # caller's buffers may be reused as soon as we return; only
            # the device_put rides the upload worker
            stacked = np.stack([np.asarray(imgs_l), np.asarray(imgs_r)])
            self._upload_q.append(_PendingUpload(
                self._pool.submit(jax.device_put, stacked), n_valid))
        if len(self._upload_q) >= 2:
            up = self._upload_q.pop(0)
            self._dispatch(up.fut.result(), up.n_valid)
        if len(self._pending) >= 2:
            self._settle_one()

    @staticmethod
    def _upload(imgs_l, imgs_r):
        stacked = np.stack([np.asarray(imgs_l), np.asarray(imgs_r)])
        return jax.device_put(stacked)

    def _submit(self, imgs_l, imgs_r, n_valid):
        """Unpipelined submit (upload inline, then dispatch)."""
        self._dispatch(self._upload(imgs_l, imgs_r), n_valid)

    def _dispatch(self, imgs, n_valid):
        assert self.prev_pts is not None, "call initialize() first"
        if self.loop_closer is not None:
            bows_p = self.loop_closer.db.bows_p
            bows_l = self.loop_closer.db.bows_l
            if bows_l is None:
                bows_l = self._dummy_bows
        else:
            bows_p = bows_l = self._dummy_bows
        (host_blk, state, bows_p2, bows_l2, crit2,
         last_p, last_l, DT_next) = self._step(
            imgs, self.prev_pts, self.prev_lns, self.DT_prev,
            self._crit, self.state, bows_p, bows_l)
        with self._lock:
            self.state = state
        if self.loop_closer is not None:
            self.loop_closer.db.bows_p = bows_p2
            if self.loop_closer.db.bows_l is not None:
                self.loop_closer.db.bows_l = bows_l2
        self.prev_pts, self.prev_lns = last_p, last_l
        self.DT_prev = DT_next
        self._crit = crit2
        self._pending.append(_PendingChunk(host_blk, n_valid))

    def _settle_one(self) -> int:
        p = self._pending.pop(0)
        host_blk = np.asarray(jax.device_get(p.host_ref))  # ONE transfer
        n_slots = self.kmax
        F = self.cfg.mapping.max_kfs
        tail = n_slots * _PS + 2 * n_slots * F + F * 16
        n_fb = host_blk.size - tail
        fb = host_blk[:n_fb].reshape(-1, _PF)
        off = n_fb
        sb = host_blk[off:off + n_slots * _PS].reshape(n_slots, _PS)
        off += n_slots * _PS
        scores = host_blk[off:off + n_slots * F].reshape(n_slots, F)
        off += n_slots * F
        covis = host_blk[off:off + n_slots * F].reshape(n_slots, F)
        off += n_slots * F
        kf_poses = host_blk[off:].reshape(F, 4, 4)
        B = fb.shape[0] if p.n_valid is None else p.n_valid

        DT = fb[:, :16].reshape(-1, 4, 4)
        T_acc = fb[:, 16:32].reshape(-1, 4, 4)
        good = fb[:, 32] > 0.5
        flags = fb[:, 33] > 0.5
        if (fb[:B, 37] > 0.5).any():
            # the criterion wanted more than kf_batch KFs this chunk; the
            # extra candidate fires next chunk (bounded deferral, see
            # kf_scan). Persistent deferral shifts KF placement — raise
            # system.kf_batch or shrink the chunk if accuracy matters.
            self.n_kf_deferral_chunks += 1
            if self.n_kf_deferral_chunks == 1:
                import warnings
                warnings.warn(
                    "FusedPLSLAM: keyframe criterion hit the kf_batch "
                    f"cap ({self.kmax}) in a chunk; KF(s) deferred to "
                    "the next chunk. If this repeats, raise "
                    "system.kf_batch for this chunk size.")
        # trajectory integration (fallback to last good step)
        n_kfs_new = 0
        for i in range(B):
            step = DT[i] if good[i] else self._last_step_host
            self._T_wc = (self._T_wc @ np.linalg.inv(step)).astype(np.float32)
            self._last_step_host = step.astype(np.float32)
            self.trajectory.append(self._T_wc.copy())
            self._frame_anchor.append(
                (self._kf_slot, T_acc[i].astype(np.float32)))
            if flags[i]:
                self._kf_slot += 1
                n_kfs_new += 1

        # per-slot records + loop logic (device slot numbering from
        # stats[6]: the program is the only authority — chunk k+1 is
        # submitted before chunk k settles, so host counting would lag)
        slots_valid = sb[:, 0] > 0.5
        poses = sb[:, 2:18].reshape(n_slots, 4, 4)
        stats = sb[:, 18:25]
        # sanity tripwire (costs nothing — the buffer is already on
        # host): an inserted KF pose at an insane magnitude means
        # upstream state corruption; localize it NOW, not at finish()
        for j in range(n_slots):
            if slots_valid[j]:
                pm = float(np.abs(poses[j][:3, 3]).max())
                if pm > 1e3:
                    print(f"[fused_slam] WARNING: settled KF slot "
                          f"{int(stats[j, 6])} (frame ~"
                          f"{len(self.trajectory)}) pose |t|={pm:.3g} "
                          "— state corruption upstream of insertion")
        # whole-snapshot tripwire: the packed block already carries the
        # full kf_pose array, so ANY corruption (e.g. a window-LBA
        # catapult of a non-inserted slot) is localized to within one
        # chunk of when it entered
        tmags = np.abs(kf_poses[:max(self._next_slot, 1), :3, 3]
                       ).max(-1)
        if tmags.size and float(tmags.max()) > 1e3:
            s = int(np.argmax(tmags))
            print(f"[fused_slam] WARNING: kf_pose snapshot slot {s} "
                  f"|t|={tmags.max():.3g} at frame ~"
                  f"{len(self.trajectory)} — map corrupted this chunk")
        if slots_valid.any():
            self._next_slot = int(stats[slots_valid, 6].max()) + 1
        corrected = None
        for j in range(n_slots):
            if not slots_valid[j]:
                continue
            slot = int(stats[j, 6])
            self._records.append(KeyFrameSummary(
                slot=slot, T_w_kf=poses[j].astype(np.float32),
                n_map_matches=int(stats[j, 2]), n_new_points=int(stats[j, 3]),
                lba_cost0=float(stats[j, 0]), lba_cost1=float(stats[j, 1]),
                lba_pt_overflow=int(stats[j, 4]),
                lba_ln_overflow=int(stats[j, 5])))
            if self.loop_closer is not None:
                if corrected is not None:
                    kf_poses = corrected
                out = self.loop_closer._handle_probe_result(
                    self, slot, scores[j].copy(), covis[j],
                    self._next_slot, kf_poses)
                if out is not None:
                    corrected = out
        self._last_settled = (np.asarray(kf_poses) if corrected is None
                              else corrected)
        # KF-capacity management: when the next chunk could run into the
        # slot ceiling, compact retired slots away (rare, stop-the-world;
        # the reference deletes retired KeyFrames outright — mapHandler::
        # removeRedundantKFs — so sequence length is unbounded there
        # and, with this, here). Runs AFTER the settle so everything
        # above used one consistent slot numbering.
        if (not self._compacting
                and self._next_slot >= self.cfg.mapping.max_kfs
                - 2 * self.kmax):
            self._compact()
        return n_kfs_new

    def _settle_all(self):
        while self._upload_q:
            up = self._upload_q.pop(0)
            self._dispatch(up.fut.result(), up.n_valid)
        while self._pending:
            self._settle_one()

    def _compact(self):
        """Stop-the-world KF-slot compaction (see backend.map.
        compact_keyframes): drain the pipeline, drop retired slots on
        device, then remap every slot-valued host structure — frame
        anchors (re-expressed against the nearest surviving earlier KF
        using the pre-compaction poses), the loop closer's graph edges
        and BoW rows. Raises if compaction cannot free at least one
        chunk's worth of slots (true capacity: raise mapping.max_kfs)."""
        from plslam_tpu.backend.map import (compact_keyframes,
                                            force_retire_kfs)
        self._compacting = True
        try:
            self._settle_all()
            F = self.cfg.mapping.max_kfs
            target = F - 2 * self.kmax       # room the next chunks need
            with self._lock:
                n_live = int(jax.device_get(jnp.sum(
                    self.state.kf_valid.astype(jnp.int32))))
                if n_live >= target:
                    # regular sweeps retired nothing the compaction can
                    # reclaim: the sequence is genuinely non-redundant
                    # and longer than max_kfs — evict under memory
                    # pressure (most-redundant-then-oldest; see
                    # backend.map.force_retire_kfs)
                    # config-constant count (it is a static jit arg —
                    # a data-dependent count would recompile per event)
                    # must EXCEED the 2*kmax headroom the next chunks
                    # need (evicting exactly the margin leaves nv ==
                    # target and the capacity check below still fires).
                    # SMALL batches: each evicted KF is deleted map
                    # history, and deleting a third of the map at once
                    # (the round-5 F//8=64-KF batches) produced a ~20 m
                    # trajectory transient while the map rebuilt; more
                    # frequent, smaller evictions amortize the same
                    # capacity pressure at a fraction of the accuracy
                    # cost (each event costs one pipeline drain ~0.5 s)
                    n_evict = min(max(3 * self.kmax, F // 32), F // 4)
                    valid_before = np.asarray(
                        jax.device_get(self.state.kf_valid))
                    self.state, _ = force_retire_kfs(
                        self.state, self.cfg, n_evict)
                    valid_after = np.asarray(
                        jax.device_get(self.state.kf_valid))
                    evicted = np.nonzero(valid_before & ~valid_after)[0]
                    self.n_evicted_kfs += int(evicted.size)
                    self.eviction_events.append(
                        (len(self.trajectory),
                         [int(s) for s in evicted]))
                    if len(self.eviction_events) == 1:
                        import warnings
                        warnings.warn(
                            "FusedPLSLAM: KF capacity pressure forced "
                            f"eviction of {evicted.size} NON-redundant "
                            "keyframe(s) — map history is being lost. "
                            "Raise mapping.max_kfs for this sequence "
                            "scale. (Further evictions are recorded in "
                            "eviction_events without warning.)")
                old_poses = np.asarray(jax.device_get(self.state.kf_pose))
                new_state, exact_d, _floor_d, nv_d = compact_keyframes(
                    self.state)
                exact, nv = jax.device_get((exact_d, nv_d))
                self.state = new_state
            exact = np.asarray(exact)
            nv = int(nv)
            if nv >= target:
                raise RuntimeError(
                    f"KF capacity exhausted: {nv} live keyframes of "
                    f"max_kfs={F} after compaction + eviction (window "
                    "span leaves nothing evictable). Raise "
                    "mapping.max_kfs for this sequence scale.")
            # old slot of each surviving new slot (for anchor re-expression)
            old_of_new = np.zeros((F,), np.int32)
            for old, new in enumerate(exact):
                if new >= 0:
                    old_of_new[new] = old
            # nearest surviving slot at-or-before each old slot
            floor = np.maximum.accumulate(
                np.where(exact >= 0, exact, -1))

            def remap_anchor(s, T_rel):
                s = min(int(s), F - 1)
                if exact[s] >= 0:
                    return (int(exact[s]), T_rel)
                v = int(floor[s])            # new slot of survivor
                if v < 0:
                    return (0, T_rel)
                T_surv = old_poses[old_of_new[v]]
                T_new = (np.linalg.inv(T_surv) @ old_poses[s]
                         @ T_rel).astype(np.float32)
                return (v, T_new)

            self._frame_anchor = [remap_anchor(s, T) for s, T in
                                  self._frame_anchor]
            self._kf_slot = remap_anchor(self._kf_slot,
                                         np.eye(4, dtype=np.float32))[0]
            self._next_slot = nv
            if self.loop_closer is not None:
                self.loop_closer.remap_slots(exact, nv,
                                             old_poses=old_poses)
            with self._lock:
                self._last_settled = np.asarray(
                    jax.device_get(self.state.kf_pose))
            pm = float(np.abs(self._last_settled[:nv, :3, 3]).max())
            if pm > 1e3:
                print(f"[fused_slam] WARNING: post-compaction KF pose "
                      f"|t|max={pm:.3g} — compaction-era corruption")
            self.n_compactions += 1
        finally:
            self._compacting = False

    # -- queries -------------------------------------------------------------
    @property
    def summaries(self):
        return list(self._records)

    def online_pose(self, drain: bool = False) -> np.ndarray:
        """Map-consistent pose estimate: the latest settled KF's
        (LBA/loop-corrected) pose composed with the tracker's relative
        chain since that KF.

        ``drain=False`` (default) is the ONLINE fast path: it reads
        only already-settled state, so a consumer polling the pose
        never stalls the depth-2 pipeline — the estimate lags by at
        most the in-flight chunks (< 2 chunk durations), the same
        staleness class as the reference's mapping-thread corrections.
        ``drain=True`` forces a full pipeline settle first (exact up to
        the last submitted chunk, at the cost of a stall)."""
        if drain:
            self._settle_all()
        if self._last_settled is None or not self._frame_anchor:
            return self._T_wc.copy()
        slot, T_rel = self._frame_anchor[-1]
        return (self._last_settled[slot] @ T_rel).astype(np.float32)

    def kf_poses(self) -> np.ndarray:
        with self._lock:
            n = int(jax.device_get(self.state.n_kfs))
            return np.asarray(jax.device_get(self.state.kf_pose[:n]))

    def n_landmarks(self) -> Tuple[int, int]:
        with self._lock:
            return (int(jax.device_get(jnp.sum(self.state.pt_valid))),
                    int(jax.device_get(jnp.sum(self.state.ln_valid))))

    def finish(self) -> np.ndarray:
        """Settle everything and recompose the trajectory from corrected
        KF poses + per-frame relatives (finishSLAM parity)."""
        self._settle_all()
        kf_poses = self.kf_poses()
        out = []
        for kf_slot, T_rel in self._frame_anchor:
            slot = min(kf_slot, len(kf_poses) - 1)
            out.append(kf_poses[slot] @ T_rel)
        return np.stack(out)

    # -- checkpoint / resume -------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Settle the pipeline and persist everything a resumed driver
        needs: the device MapState + config (backend.checkpoint) plus
        the host-side continuation state — trajectory, frame anchors,
        tracker carry (criterion state, last features, prior) and the
        loop closer's graph edges. BoW matrices are NOT stored: they are
        recomputed from the per-KF descriptors already in MapState
        (bit-identical — the transform is deterministic)."""
        from plslam_tpu.backend.checkpoint import save_map
        self._settle_all()
        extra = {
            "trajectory": np.stack(self.trajectory),
            "anchor_slots": np.asarray([s for s, _ in self._frame_anchor],
                                       np.int32),
            "anchor_T": np.stack([T for _, T in self._frame_anchor]
                                 ) if self._frame_anchor else
            np.zeros((0, 4, 4), np.float32),
            "kf_slot": np.asarray(self._kf_slot, np.int32),
            "next_slot": np.asarray(self._next_slot, np.int32),
            "T_wc": self._T_wc,
            "last_step": self._last_step_host,
            "DT_prev": np.asarray(jax.device_get(self.DT_prev)),
            "n_compactions": np.asarray(self.n_compactions, np.int32),
            "n_kf_deferral_chunks": np.asarray(self.n_kf_deferral_chunks,
                                               np.int32),
            "n_evicted_kfs": np.asarray(self.n_evicted_kfs, np.int32),
        }
        for i, leaf in enumerate(jax.device_get(tuple(self._crit))):
            extra[f"crit_{i}"] = np.asarray(leaf)
        pts_leaves, pts_def = jax.tree_util.tree_flatten(self.prev_pts)
        for i, leaf in enumerate(jax.device_get(pts_leaves)):
            extra[f"prev_pts_{i}"] = np.asarray(leaf)
        if self.prev_lns is not None:
            lns_leaves, _ = jax.tree_util.tree_flatten(self.prev_lns)
            for i, leaf in enumerate(jax.device_get(lns_leaves)):
                extra[f"prev_lns_{i}"] = np.asarray(leaf)
        if self.loop_closer is not None:
            lc = self.loop_closer
            def pack_edges(edges, width):
                # columns: i, j, T(16), then the width-3 trailing scalars
                out = np.zeros((len(edges), 15 + width), np.float32)
                for n_, e in enumerate(edges):
                    out[n_, 0], out[n_, 1] = e[0], e[1]
                    out[n_, 2:18] = np.asarray(e[2]).reshape(16)
                    out[n_, 18:] = e[3:width]
                return out
            extra["lc_odo"] = pack_edges(lc.odo_edges, 4)
            extra["lc_covis"] = pack_edges(lc.covis_edges, 5)
            extra["lc_loop"] = pack_edges(lc.loop_edges, 4)
            extra["lc_n_loops"] = np.asarray(lc.n_loops_closed, np.int32)
            # the post-closure lockout must survive resume (else a
            # resumed driver may immediately re-close the same loop)
            extra["lc_probes_since_close"] = np.asarray(
                min(lc.probes_since_close, 10 ** 9), np.int64)
        save_map(path, self.state, self.cfg, extra=extra)

    @classmethod
    def resume(cls, path: str, cam: Optional[StereoCamera] = None,
               enable_loops: Optional[bool] = None) -> "FusedPLSLAM":
        """Reconstruct a live driver from a checkpoint: MapState +
        tracker carry restored exactly; the loop closer's BoW matrices
        are rebuilt from the per-KF descriptors stored in MapState and
        its graph edges reloaded — a resumed run continues closing
        loops against pre-checkpoint keyframes."""
        from plslam_tpu.backend.checkpoint import load_map
        state, cfg, extra = load_map(path)
        self = cls(cfg, cam, enable_loops=enable_loops)
        with self._lock:
            self.state = state
        self.trajectory = [t.astype(np.float32)
                           for t in extra["trajectory"]]
        self._frame_anchor = [
            (int(s), np.asarray(T, np.float32)) for s, T in
            zip(extra["anchor_slots"], extra["anchor_T"])]
        self._kf_slot = int(extra["kf_slot"])
        self._next_slot = int(extra["next_slot"])
        self._T_wc = np.asarray(extra["T_wc"], np.float32)
        self._last_step_host = np.asarray(extra["last_step"], np.float32)
        self.DT_prev = jnp.asarray(extra["DT_prev"])
        self.n_compactions = int(extra.get("n_compactions", 0))
        self.n_kf_deferral_chunks = int(
            extra.get("n_kf_deferral_chunks", 0))
        self.n_evicted_kfs = int(extra.get("n_evicted_kfs", 0))
        self._crit = CritCarry(*[jnp.asarray(extra[f"crit_{i}"])
                                 for i in range(len(CritCarry._fields))])
        # feature containers are flat NamedTuples of arrays, so the
        # saved leaves ARE the fields in order
        from plslam_tpu.frontend.features import (LineObservations,
                                                  PointObservations)
        self.prev_pts = PointObservations(
            *[jnp.asarray(extra[f"prev_pts_{i}"])
              for i in range(len(PointObservations._fields))])
        if any(k.startswith("prev_lns_") for k in extra):
            self.prev_lns = LineObservations(
                *[jnp.asarray(extra[f"prev_lns_{i}"])
                  for i in range(len(LineObservations._fields))])
        if self.loop_closer is not None:
            lc = self.loop_closer
            def unpack(arr, extra_cols):
                out = []
                for row in arr:
                    e = (int(row[0]), int(row[1]),
                         row[2:18].reshape(4, 4).astype(np.float32))
                    e = e + tuple(
                        (int(c) if float(c).is_integer() else float(c))
                        for c in row[18:18 + extra_cols])
                    out.append(e)
                return out
            lc.odo_edges = [(i, j, T, float(w)) for (i, j, T, w) in
                            unpack(extra.get("lc_odo",
                                             np.zeros((0, 19))), 1)]
            lc.covis_edges = [(i, j, T, float(w), int(ns)) for
                              (i, j, T, w, ns) in
                              unpack(extra.get("lc_covis",
                                               np.zeros((0, 20))), 2)]
            lc.loop_edges = [(i, j, T, float(w)) for (i, j, T, w) in
                             unpack(extra.get("lc_loop",
                                              np.zeros((0, 19))), 1)]
            lc.n_loops_closed = int(extra.get("lc_n_loops", 0))
            lc.probes_since_close = int(
                extra.get("lc_probes_since_close", 10 ** 9))
            self._rebuild_bows()
        self._last_settled = np.asarray(
            jax.device_get(self.state.kf_pose))
        return self

    def _rebuild_bows(self):
        """Recompute the loop database's BoW matrices from the per-KF
        descriptor sets stored in MapState (checkpoints do not carry
        them; the transform is deterministic, so a resumed database is
        bit-identical to the pre-checkpoint one)."""
        from plslam_tpu.loop.loop_closer import probe_core
        lc = self.loop_closer
        db = lc.db
        n = int(jax.device_get(self.state.n_kfs))
        for slot in range(n):
            bows_l = db.bows_l if db.bows_l is not None else self._dummy_bows
            bp, bl, _, _, _ = jax.jit(
                partial(probe_core, db.voc_p, db.voc_l, self.cfg,
                        db.bows_l is not None))(
                self.state, db.bows_p, bows_l, jnp.asarray(slot))
            db.bows_p = bp
            if db.bows_l is not None:
                db.bows_l = bl
            if lc._dist is not None:        # mirror into the sharded DB
                lc._dist.insert(slot, db.bows_p[slot],
                                db.bows_l[slot]
                                if db.bows_l is not None else None)

    def close(self):
        if self._upload_q:
            # queued-but-undispatched chunks would be silently dropped;
            # finish() is the orderly path — warn loudly, don't lose data
            import warnings
            warnings.warn(
                f"FusedPLSLAM.close() with {len(self._upload_q)} chunk(s) "
                "still queued — call finish() first to settle them; "
                "draining now", stacklevel=2)
            self._settle_all()
        self._pool.shutdown(wait=True)
