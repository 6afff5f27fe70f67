"""Loop-closure pipeline: retrieval -> geometric verification ->
pose-graph optimization -> map correction.

Reference parity: pl-slam ``src/mapHandler.cpp`` loop-closure path —
``insertKFBowVectorP/L``, ``lookForLoopCandidates``, ``isLoopClosure``
(BF descriptor matching + the VO robust-GN relative-pose solve with
inlier/residual/correction gates), ``loopClosureOptimizationEssential
GraphG2O`` (here: loop.pose_graph GN) and the landmark re-anchoring of
``loopClosureFuseLandmarks``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.ops import hamming
from plslam_tpu.ops.gather import take_mxu
from plslam_tpu.loop import vocabulary
from plslam_tpu.loop.database import (BowDatabase, ConsistencyVoter,
                                      LoopCandidate, select_candidates)
from plslam_tpu.loop.pose_graph import (PoseGraph, frozen_mask,
                                        optimize_pose_graph,
                                        optimize_pose_graph_pcg)
from plslam_tpu.tracking import pose_gn


@partial(jax.jit, static_argnames=("cfg",))
def verify_loop_geometry(kf_desc_a, obs_uv_a, obs_disp_a,
                         kf_desc_b, obs_uv_b,
                         ln_desc_a, ln_ends_a, ln_desc_b, ln_ends_b,
                         ln_le_b,
                         cam: StereoCamera, cfg: SlamConfig):
    """isLoopClosure geometric half: BF-match the stored ORB *and* LBD
    descriptors of candidate KF a and current KF b (the reference matches
    both families before the solve), robust-GN solve T_ab mapping
    a-frame 3D points / line endpoints onto b observations."""
    desc_a = hamming.unpack_bits(kf_desc_a.reshape(-1, 8))
    desc_b = hamming.unpack_bits(kf_desc_b.reshape(-1, 8))
    valid_a = obs_disp_a > 0
    valid_b = jnp.any(obs_uv_b != 0, axis=-1)
    dist = hamming.hamming_matrix(desc_a, desc_b, valid_a, valid_b,
                                  bf16=cfg.system.bf16_matching)
    mres = hamming.match_nnr(dist, cfg.matching.max_hamming_p,
                             cfg.matching.min_ratio_12_p, mutual=True)
    idx = jnp.maximum(mres.idx, 0)
    P_a = cam.back_project(obs_uv_a, jnp.where(valid_a, obs_disp_a, 1.0))
    uv_b = jnp.take(obs_uv_b, idx, axis=0)
    terms = pose_gn.PointTerms(P_a, uv_b, mres.valid & valid_a)

    ln_terms = None
    n_ln = jnp.asarray(0, jnp.int32)
    if cfg.lines.has_lines:
        ld_a = hamming.unpack_bits(ln_desc_a.reshape(-1, 8))
        ld_b = hamming.unpack_bits(ln_desc_b.reshape(-1, 8))
        lva = (ln_ends_a[:, 4] > 0) & (ln_ends_a[:, 5] > 0)
        lvb = (ln_ends_b[:, 4] > 0) & (ln_ends_b[:, 5] > 0)
        ldist = hamming.hamming_matrix(ld_a, ld_b, lva, lvb,
                                       bf16=cfg.system.bf16_matching)
        lres = hamming.match_nnr(ldist, cfg.matching.max_hamming_l,
                                 cfg.matching.min_ratio_12_l, mutual=True)
        lidx = jnp.maximum(lres.idx, 0)
        sP_a = cam.back_project(ln_ends_a[:, 0:2],
                                jnp.where(lva, ln_ends_a[:, 4], 1.0))
        eP_a = cam.back_project(ln_ends_a[:, 2:4],
                                jnp.where(lva, ln_ends_a[:, 5], 1.0))
        le_b = jnp.take(ln_le_b, lidx, axis=0)
        ln_terms = pose_gn.LineTerms(sP_a, eP_a, le_b, lres.valid & lva)
        n_ln = jnp.sum(lres.valid)

    res = pose_gn.optimize_pose(jnp.eye(4), cam, terms, ln_terms, cfg)
    return res, jnp.sum(mres.valid) + n_ln


@partial(jax.jit, static_argnames=("max_points",))
def covisibility_counts(obs_pt_lm: jnp.ndarray, slot: jnp.ndarray,
                        max_points: int) -> jnp.ndarray:
    """(F,) shared-landmark counts between KF ``slot`` and every KF.

    Reference parity: the covisibility weights mapHandler.cpp maintains
    between KeyFrames (shared MapPoint observation counts), which select
    the pairs that receive essential-graph edges. Here there is no graph
    data structure: a one-hot membership vector over landmark slots plus
    one masked gather over the full (F, K) observation table yields all
    pairwise-with-slot counts in a single vectorized pass.
    """
    lm_slot = obs_pt_lm[slot]                               # (K,)
    member = jnp.zeros((max_points,), jnp.float32).at[
        jnp.clip(lm_slot, 0, max_points - 1)].max(
        (lm_slot >= 0).astype(jnp.float32))                 # (P,) 0/1
    # membership lookup over the FULL (F, K) observation table = an
    # (F*K)-element arbitrary gather — MXU one-hot contraction, chunked
    # (the serialized native gather cost several ms per keyframe)
    hits = jnp.where(obs_pt_lm >= 0, take_mxu(member, obs_pt_lm), 0.0)
    return jnp.sum(hits, axis=-1)                           # (F,)


@partial(jax.jit, static_argnames=())
def apply_graph_correction(state, new_poses: jnp.ndarray):
    """Re-anchor landmarks to the corrected KF poses: each landmark moves
    with the pose delta of its first observing KF
    (loopClosureFuseLandmarks re-anchoring half)."""
    old = state.kf_pose
    delta = lie.mm(new_poses, jax.vmap(lie.inverse_se3)(old))  # (F, 4, 4)

    def move(pos, first_kf):
        d = delta[jnp.maximum(first_kf, 0)]
        moved = jnp.einsum("n a b, n b -> n a", d[:, :3, :3], pos,
                           precision=jax.lax.Precision.HIGHEST) + d[:, :3, 3]
        return jnp.where((first_kf >= 0)[:, None], moved, pos)

    def rot(dirs, first_kf):
        d = delta[jnp.maximum(first_kf, 0)][:, :3, :3]
        moved = jnp.einsum("n a b, n b -> n a", d, dirs,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.where((first_kf >= 0)[:, None], moved, dirs)

    return state._replace(
        kf_pose=jnp.where(state.kf_valid[:, None, None], new_poses,
                          state.kf_pose),
        pt_pos=move(state.pt_pos, state.pt_first_kf),
        pt_dir=rot(state.pt_dir, state.pt_first_kf),
        ln_spos=move(state.ln_spos, state.ln_first_kf),
        ln_epos=move(state.ln_epos, state.ln_first_kf),
        ln_dir=rot(state.ln_dir, state.ln_first_kf))


def probe_core(voc_p, voc_l, cfg: SlamConfig, has_lines: bool,
               state, bows_p, bows_l, slot):
    """insertKFBowVectorP/L + database query + covisibility counts as a
    TRACEABLE unit — used standalone (jitted below) by the per-frame
    system and inlined into the fused chunk back-end program
    (backend.chunk_backend). The vocabularies are closed over (their
    tree-shape ints are Python loop bounds, so they cannot be jit
    arguments). Returns (bows_p, bows_l, scores, covis, pose)."""
    from plslam_tpu.loop.vocabulary import bow_vector, l1_score

    desc_p = hamming.unpack_bits(state.kf_pt_desc[slot].reshape(-1, 8))
    valid_p = state.obs_pt_disp[slot] > 0
    vp = bow_vector(voc_p, desc_p, valid_p)
    bows_p2 = bows_p.at[slot].set(vp)
    s = l1_score(bows_p2, vp[None, :])
    bows_l2 = bows_l
    if has_lines:
        desc_l = hamming.unpack_bits(
            state.kf_ln_desc[slot].reshape(-1, 8))
        valid_l = state.obs_ln_lm[slot] >= 0
        vl = bow_vector(voc_l, desc_l, valid_l)
        bows_l2 = bows_l.at[slot].set(vl)
        s = 0.5 * (s + l1_score(bows_l2, vl[None, :]))
    covis = covisibility_counts(state.obs_pt_lm, slot,
                                cfg.mapping.max_points)
    return bows_p2, bows_l2, s, covis, state.kf_pose[slot]


def _make_kf_probe(voc_p, voc_l, cfg: SlamConfig, has_lines: bool):
    return jax.jit(partial(probe_core, voc_p, voc_l, cfg, has_lines))


@partial(jax.jit, static_argnames=("cfg",))
def _post_loop_update(state, new_poses, slot_a, slot_b,
                      cam: StereoCamera, cfg: SlamConfig):
    """Apply the pose-graph correction, fuse duplicate landmarks of the
    loop pair, and re-converge the local window with one LBA pass — one
    device program instead of three dispatches + interleaved fetches."""
    from plslam_tpu.backend.map import fuse_loop_landmarks
    from plslam_tpu.backend.map_handler import run_window_lba
    state = apply_graph_correction(state, new_poses)
    state, n_fused = fuse_loop_landmarks(state, slot_a, slot_b, cfg)
    state, _, _, _ = run_window_lba(state, cam, cfg)
    return state, n_fused


def floored_uncertainty(cov, n_inl: int, err: float,
                        cfg: SlamConfig) -> float:
    """Worst-axis variance of a verification solve with the residual
    sigma floored at the detector pixel noise (see the lc_unc gate in
    LoopCloser._close_loop for why the raw covariance is not enough)."""
    n_res = max(2.0 * float(n_inl), 8.0)
    sigma2 = float(err) ** 2 * n_res / (n_res - 6.0)  # pose_gn's estimate
    floor2 = cfg.mapping.lba_min_sigma ** 2
    scale = max(sigma2, floor2) / max(sigma2, 1e-12)
    return float(np.max(np.diagonal(np.asarray(cov)))) * scale


class LoopEvent(NamedTuple):
    kf_from: int
    kf_to: int
    n_inliers: int
    residual: float
    correction_t: float
    correction_r_deg: float
    graph_cost0: float
    graph_cost1: float


class LoopCloser:
    def __init__(self, cfg: SlamConfig, cam: StereoCamera):
        self.cfg = cfg
        self.cam = cam
        voc_p = vocabulary.default_vocabulary("orb", cfg.loop.vocab_k,
                                              cfg.loop.vocab_l)
        voc_l = (vocabulary.default_vocabulary("lbd", cfg.loop.vocab_k,
                                               cfg.loop.vocab_l)
                 if cfg.lines.has_lines else None)
        self.db = BowDatabase(cfg, voc_p, voc_l)
        # sharded place recognition (P7): candidate retrieval runs on a
        # 'kf' device mesh instead of the primary chip's full matrix
        self._dist = None
        if cfg.loop.distributed:
            from plslam_tpu.parallel.dist_vocab import DistRetrieval
            self._dist = DistRetrieval(
                cfg, voc_p.n_leaves,
                voc_l.n_leaves if voc_l is not None else None)
        self.voter = ConsistencyVoter(cfg.loop.consistency_window)
        self.odo_edges = []          # (i, j, T_rel np, w)
        self.covis_edges = []        # (i, j, T_rel np, w, n_shared)
        self.loop_edges = []
        self.events = []
        self.n_loops_closed = 0
        self.n_edges_dropped = 0     # covis edges lost to the E cap (telemetry)
        # funnel telemetry: why candidates did or didn't become closures
        # (mapHandler prints equivalents to stdout; here they are
        # counters a driver/bench can surface)
        self.n_candidates = 0        # candidates passing lc_mat
        self.n_votes_fired = 0       # consistency streaks completing
        self.n_rej_geom = 0          # verification solve failed/inl/res
        self.n_rej_unc = 0           # lc_unc covariance gate
        self.n_rej_corr = 0          # lc_trs/lc_rot correction magnitude
        self.n_frozen_events = 0     # graph solves with disconnected KFs
        self.probes_since_close = 10 ** 9   # MapHandler pipelining hint
        self._probe = None           # lazily-built fused per-KF program

    @property
    def closure_imminent(self) -> bool:
        """True when a candidate streak is ONE vote from firing or a
        closure just fired — the drivers then revert from pipelined to
        strict ordering so corrections land before further insertions.
        (Any-streak was too trigger-happy: on loopy scenes weak
        candidates appear at nearly every KF and permanently degraded
        throughput to the unpipelined rate, while the stream-ordered
        fused driver is correction-consistent at depth 2 anyway.)"""
        near = any(c >= self.voter.window - 1
                   for c in self.voter._streaks.values())
        return near or self.probes_since_close < 8

    def remap_slots(self, exact_map: np.ndarray, n_valid: int,
                    old_poses: Optional[np.ndarray] = None) -> None:
        """Rewrite all slot-valued host state after a KF-slot compaction
        (backend.map.compact_keyframes): ``exact_map[old] = new`` slot or
        -1 for retired-and-dropped slots.

        Odometry edges crossing a dropped KF are COMPOSED (their relative
        transforms chain exactly), so the graph stays connected.
        Covisibility/loop edges touching a dropped slot are RE-EXPRESSED
        against the nearest surviving earlier KF when ``old_poses`` (the
        pre-compaction pose snapshot) is available — the measurement
        composes exactly with the survivors' relative pose, the same
        math the frame anchors use; without the snapshot they are
        dropped. Keeping them matters: the round-5 endurance run showed
        a ~20 m trajectory transient in the compaction era when the
        eviction deleted that era's loop stitching wholesale. BoW rows
        are permuted on device; consistency streaks reset (at most
        ``consistency_window`` votes of warm-up lost)."""
        exact = np.asarray(exact_map)
        F = exact.shape[0]
        # nearest surviving old slot at-or-before s (for re-expression)
        floor_old = np.full((F,), -1, np.int64)
        last = -1
        for s in range(F):
            if exact[s] >= 0:
                last = s
            floor_old[s] = last

        def move_end(s):
            """old slot -> (new slot, T_corr = T_s'^-1 T_s) through the
            nearest surviving earlier KF s' (identity if s survives)."""
            if exact[s] >= 0:
                return int(exact[s]), np.eye(4, dtype=np.float32)
            sp = int(floor_old[s])
            if sp < 0 or old_poses is None:
                return -1, None
            T_corr = (np.linalg.inv(old_poses[sp])
                      @ old_poses[s]).astype(np.float32)
            return int(exact[sp]), T_corr

        odo = sorted(self.odo_edges, key=lambda e: e[0])
        new_odo = []
        chain = None            # (old start slot, old last slot, composed T)
        for (i, j, T, w) in odo:
            if chain is None or chain[1] != i:
                chain = (i, i, np.eye(4, dtype=np.float32))  # new chain
            start, _, T_acc = chain
            T_acc = (T_acc @ T).astype(np.float32)
            if exact[j] >= 0:
                if exact[start] >= 0:
                    new_odo.append((int(exact[start]), int(exact[j]),
                                    T_acc, w))
                chain = (j, j, np.eye(4, dtype=np.float32))
            else:
                chain = (start, j, T_acc)    # j dropped: keep composing
        self.odo_edges = new_odo

        def remap_pair(i, j, T):
            """Edge T = T_i^-1 T_j re-expressed between survivors:
            T' = T_corr_i @ T @ T_corr_j^-1."""
            i2, Ci = move_end(i)
            j2, Cj = move_end(j)
            if i2 < 0 or j2 < 0 or i2 == j2:
                return None
            T2 = T
            if Ci is not None and not np.array_equal(Ci, np.eye(4)):
                T2 = Ci @ T2
            if Cj is not None and not np.array_equal(Cj, np.eye(4)):
                T2 = T2 @ np.linalg.inv(Cj)
            return (min(i2, j2), max(i2, j2),
                    (T2 if i2 < j2 else np.linalg.inv(T2)
                     ).astype(np.float32))

        new_covis = []
        for (i, j, T, w, ns) in self.covis_edges:
            r = remap_pair(i, j, T)
            if r is not None:
                new_covis.append((r[0], r[1], r[2], w, ns))
        self.covis_edges = new_covis
        new_loops = []
        for (i, j, T, w) in self.loop_edges:
            r = remap_pair(i, j, T)
            if r is not None:
                new_loops.append((r[0], r[1], r[2], w))
        self.loop_edges = new_loops

        # permute BoW rows: new row n reads old row perm[n]; tail zeroed
        F = exact.shape[0]
        perm = np.zeros((F,), np.int32)
        for old, new in enumerate(exact):
            if new >= 0:
                perm[new] = old
        live = (jnp.arange(F) < n_valid)

        def permute(b):
            if b is None:
                return None
            out = jnp.take(b, jnp.asarray(perm), axis=0)
            return jnp.where(live[:, None], out, 0.0)

        self.db.bows_p = permute(self.db.bows_p)
        self.db.bows_l = permute(self.db.bows_l)
        if self._dist is not None:
            self._dist.remap_slots(perm, n_valid)
        self.voter._streaks.clear()

    # -- main entry (called by PLSLAM on every new KF) -----------------------
    def on_keyframe(self, map_handler, slot: int) -> Optional[np.ndarray]:
        """Per-KF place-recognition step as ONE device program + ONE
        batched fetch (BoW transform/insert, fused dual-vocabulary query,
        covisibility counts): the mapping thread shares the chip's
        execution stream with tracking, so round-trips here are tracking
        throughput."""
        cfg = self.cfg
        with map_handler._lock:
            state = map_handler.state
            if self._probe is None:
                self._probe = _make_kf_probe(
                    self.db.voc_p, self.db.voc_l, cfg,
                    self.db.bows_l is not None)
            (self.db.bows_p, self.db.bows_l, s_d, covis_d,
             pose_d) = self._probe(state, self.db.bows_p, self.db.bows_l,
                                   jnp.asarray(slot))
            scores, covis, n_kfs, kf_poses = jax.device_get(
                (s_d, covis_d, state.n_kfs, state.kf_pose))
        out = self._handle_probe_result(map_handler, slot, scores, covis,
                                        int(n_kfs), kf_poses)
        return out[slot] if out is not None else None

    def on_probe_batch(self, map_handler, slots, scores_d, covis_d, poses_d
                       ) -> Optional[np.ndarray]:
        """Single-batch convenience wrapper over on_probe_batches."""
        return self.on_probe_batches(map_handler,
                                     [(slots, scores_d, covis_d, poses_d)])

    def on_probe_batches(self, map_handler, batches) -> Optional[np.ndarray]:
        """Consume the stacked probe outputs of one or MORE fused
        chunk-backend dispatches (backend.chunk_backend) with ONE host
        fetch for everything, then the usual per-KF edge/candidate/vote
        logic in slot order. Batching several dispatches per fetch
        matters on tunnel-attached runtimes: each fetch must wait for
        its program's position in the device stream (behind in-flight
        tracking chunks), so paying that wait once per few chunks
        instead of per sub-batch is full-SLAM throughput. Returns the
        last correction (if any loop closed)."""
        with map_handler._lock:
            state = map_handler.state
            datas, n_kfs, kf_poses = jax.device_get(
                ([(s, c) for _, s, c, _ in batches],
                 state.n_kfs, state.kf_pose))
        n_kfs = int(n_kfs)
        corrected = None
        for (slots, *_), (scores, covis) in zip(batches, datas):
            for j, slot in enumerate(slots):
                if corrected is not None:
                    # a closure earlier in this flush moved every KF:
                    # the fetched snapshot is stale — use corrected poses
                    kf_poses = corrected
                out = self._handle_probe_result(
                    map_handler, slot, scores[j], covis[j],
                    n_kfs, kf_poses)
                if out is not None:
                    corrected = out
        return corrected

    def _handle_probe_result(self, map_handler, slot: int, scores, covis,
                             n_kfs: int, kf_poses
                             ) -> Optional[np.ndarray]:
        """Returns the FULL corrected (F, 4, 4) pose array if this KF
        fired a verified loop closure, else None.

        EVERY graph edge (odometry and covisibility) is measured from the
        SAME pose snapshot (``kf_poses``): with pipelined probes, the
        in-program probe pose and the flush-time poses live in different
        epochs (later LBA windows / closures have moved KFs), and mixing
        epochs inside one relative measurement injects systematic error
        — including, after a mid-flush closure, a near-identity odometry
        edge that permanently skews the graph."""
        cfg = self.cfg
        self.probes_since_close += 1
        pose = kf_poses[slot]
        # odometry edge from the previous KF, same snapshot
        if slot >= 1:
            T_rel = np.linalg.inv(kf_poses[slot - 1]) @ pose
            self.odo_edges.append((slot - 1, slot, T_rel.astype(np.float32), 1.0))

        # covisibility edges: non-adjacent earlier KFs sharing enough
        # landmarks with this one get a graph edge measured at insertion
        # time (locally drift-free, like the reference's covisibility
        # edges created as the map is built). graph_type selects the
        # reference's essential-graph vs covisibility-graph optimization
        # (loopClosureOptimization{EssentialGraph,CovGraph}G2O).
        covis_th = (cfg.loop.covis_min_shared
                    if cfg.loop.graph_type == "essential"
                    else cfg.loop.covis_min_shared_cov)
        for f in np.nonzero(covis >= covis_th)[0]:
            if f < slot - 1:
                T_rel = np.linalg.inv(kf_poses[f]) @ pose
                self.covis_edges.append(
                    (int(f), slot, T_rel.astype(np.float32),
                     cfg.loop.covis_edge_weight, int(covis[f])))

        if self._dist is not None:
            # mirror the freshly-inserted BoW row(s) into the sharded
            # database — the probe program wrote them to db.bows_*
            vp = self.db.bows_p[slot]
            vl = (self.db.bows_l[slot]
                  if self.db.bows_l is not None else None)
            self._dist.insert(slot, vp, vl)
        if slot < cfg.loop.min_kf_separation:
            return None
        if self.probes_since_close < cfg.loop.lc_cooldown:
            return None             # post-closure lockout (lc_cooldown)
        if self._dist is not None:
            # sharded candidate retrieval (P7): global top-k + covisible
            # baseline from the mesh; same semantics as
            # select_candidates (equivalence: tests/test_dist_vocab.py)
            vp = self.db.bows_p[slot]
            vl = (self.db.bows_l[slot]
                  if self.db.bows_l is not None else None)
            ts, ti, base = jax.device_get(
                self._dist.query(slot, n_kfs, vp, vl))
            baseline = max(float(base), 1e-3)
            candidates = [
                LoopCandidate(int(i), float(s) / baseline)
                for s, i in zip(ts, ti)
                if s > 0 and float(s) / baseline >= cfg.loop.lc_mat]
        else:
            scores = scores.copy()          # db.query masking, host-side
            scores[slot:] = 0.0
            scores[n_kfs:] = 0.0
            candidates, baseline = select_candidates(scores, slot, cfg)
        self.n_candidates += len(candidates)
        fired = self.voter.vote(candidates)
        if fired is None:
            return None
        self.n_votes_fired += 1
        return self._close_loop(map_handler, fired, slot, kf_poses)

    # -- verification + optimization -----------------------------------------
    def _close_loop(self, map_handler, slot_a: int, slot_b: int, kf_poses
                    ) -> Optional[np.ndarray]:
        cfg = self.cfg
        with map_handler._lock:
            state = map_handler.state
            res, n_matches = verify_loop_geometry(
                state.kf_pt_desc[slot_a], state.obs_pt_uv[slot_a],
                state.obs_pt_disp[slot_a],
                state.kf_pt_desc[slot_b], state.obs_pt_uv[slot_b],
                state.kf_ln_desc[slot_a], state.obs_ln_ends[slot_a],
                state.kf_ln_desc[slot_b], state.obs_ln_ends[slot_b],
                state.obs_ln_le[slot_b],
                self.cam, cfg)
            # ONE batched fetch for every gate input (separate np/int/
            # float casts each cost a full tunnel round trip)
            T_ab, n_inl, err, good, cov = jax.device_get(
                (res.T, res.n_inliers, res.err, res.good, res.cov))
        T_ab = np.asarray(T_ab)           # maps a-frame points -> b frame
        pose_a = kf_poses[slot_a]
        pose_b = kf_poses[slot_b]

        # gates (isLoopClosure parity: inliers, residual, UNCERTAINTY,
        # correction magnitude). The uncertainty gate rejects solves
        # whose normal matrix admits a large motion along some axis —
        # inlier-rich but geometrically degenerate candidate pairs
        # (e.g. matches concentrated on one small distant patch) pass
        # the inlier/residual gates yet would inject a sloppy loop
        # edge. The solve covariance is sigma^2 * H^-1 with sigma
        # estimated from the residuals, so on clean imagery sigma -> 0
        # hides the degeneracy; the gate therefore evaluates H^-1
        # rescaled to a FLOORED sigma (the detector's pixel noise,
        # mapping.lba_min_sigma — same floor the LBA outlier gate uses).
        n_inl = int(n_inl)
        err = float(err)
        if not bool(good) or n_inl < cfg.loop.lc_inl or err > cfg.loop.lc_res:
            self.n_rej_geom += 1
            return None
        unc = floored_uncertainty(cov, n_inl, err, cfg)
        if not np.isfinite(unc) or unc > cfg.loop.lc_unc:
            self.n_rej_unc += 1
            return None
        # measured relative pose a->b in pose-graph convention:
        # T_meas = T_a^-1 T_b with T_ab = T_cam_b<-cam_a => T_meas = T_ab^-1
        T_meas = np.linalg.inv(T_ab).astype(np.float32)
        # correction vs current odometry estimate
        T_odo = np.linalg.inv(pose_a) @ pose_b
        corr = np.linalg.inv(T_meas) @ T_odo
        t_mag = float(np.linalg.norm(corr[:3, 3]))
        r_mag = float(np.degrees(np.arccos(
            np.clip((np.trace(corr[:3, :3]) - 1) / 2, -1, 1))))
        if t_mag > cfg.loop.lc_trs or r_mag > cfg.loop.lc_rot:
            self.n_rej_corr += 1
            return None

        self.loop_edges.append((slot_a, slot_b, T_meas, 2.0))
        if (t_mag < cfg.loop.lc_min_correction_t
                and r_mag < cfg.loop.lc_min_correction_r):
            # negligible correction: the loop edge is recorded (the
            # next significant solve consumes it) and duplicates still
            # fuse, but the graph solve + correction programs are
            # skipped (see LoopClosureConfig.lc_min_correction_t)
            from plslam_tpu.backend.map import fuse_loop_landmarks
            with map_handler._lock:
                state, _ = fuse_loop_landmarks(
                    map_handler.state, jnp.asarray(slot_a),
                    jnp.asarray(slot_b), cfg)
                map_handler.state = state
            self.n_loops_closed += 1
            self.probes_since_close = 0
            self._last_costs = (0.0, 0.0)
            self.events.append(LoopEvent(
                slot_a, slot_b, n_inl, err, t_mag, r_mag, 0.0, 0.0))
            return None
        new_full = self._optimize_graph(map_handler, kf_poses)
        if new_full is not None:
            pm = float(np.abs(new_full[:, :3, 3]).max())
            if pm > 1e3:
                bad = np.nonzero(
                    np.abs(new_full[:, :3, 3]).max(-1) > 1e4)[0]
                print(f"[loop_closer] WARNING: graph solve returned "
                      f"|t|max={pm:.3g} at slots {bad.tolist()[:8]} "
                      f"(loop {slot_a}->{slot_b})")
        # apply the correction + fuse duplicate landmarks + re-converge
        # the local window with one LBA pass, all as ONE device program
        # (the reference gets the re-convergence implicitly from the next
        # KF's LBA; the fused batch path may insert several KFs first)
        from plslam_tpu.backend.map import fuse_loop_landmarks
        corrected = None
        import os as _os
        if _os.environ.get("PLSLAM_LC_DEBUG") and new_full is not None:
            # staged application with per-stage pose/landmark magnitude
            # fetches — debugging path for map-corruption hunts only
            from plslam_tpu.backend.map_handler import run_window_lba
            with map_handler._lock:
                st = apply_graph_correction(map_handler.state,
                                            jnp.asarray(new_full))
                m1 = float(jnp.abs(st.kf_pose[:, :3, 3]).max())
                st, _ = fuse_loop_landmarks(st, jnp.asarray(slot_a),
                                            jnp.asarray(slot_b), cfg)
                m2 = float(jnp.abs(st.kf_pose[:, :3, 3]).max())
                mp = float(jnp.abs(jnp.where(
                    st.pt_valid[:, None], st.pt_pos, 0.0)).max())
                st, _, _, _ = run_window_lba(st, self.cam, cfg)
                m3 = float(jnp.abs(st.kf_pose[:, :3, 3]).max())
                if max(m1, m2, m3) > 1e4 or mp > 1e4:
                    print(f"[lc-debug] loop {slot_a}->{slot_b} stage "
                          f"|t|max: corr {m1:.3g} fuse {m2:.3g} "
                          f"(pt {mp:.3g}) lba {m3:.3g}")
                map_handler.state = st
                corrected = np.asarray(jax.device_get(st.kf_pose))
            self.n_loops_closed += 1
            self.probes_since_close = 0
            ev = LoopEvent(slot_a, slot_b, n_inl, err, t_mag, r_mag,
                           self._last_costs[0], self._last_costs[1])
            self.events.append(ev)
            return corrected
        with map_handler._lock:
            if new_full is not None:
                state, _ = _post_loop_update(
                    map_handler.state, jnp.asarray(new_full),
                    jnp.asarray(slot_a), jnp.asarray(slot_b),
                    self.cam, cfg)
                corrected = np.asarray(jax.device_get(state.kf_pose))
                pm = float(np.abs(corrected[:, :3, 3]).max())
                if pm > 1e3:
                    print(f"[loop_closer] WARNING: post-loop-update "
                          f"KF pose |t|max={pm:.3g} — correction "
                          "corrupted the map")
            else:  # graph solve failed: still fuse duplicates
                state, _ = fuse_loop_landmarks(
                    map_handler.state, jnp.asarray(slot_a),
                    jnp.asarray(slot_b), cfg)
            map_handler.state = state
        self.n_loops_closed += 1
        self.probes_since_close = 0
        ev = LoopEvent(slot_a, slot_b, n_inl, err, t_mag, r_mag,
                       self._last_costs[0], self._last_costs[1])
        self.events.append(ev)
        return corrected

    def _optimize_graph(self, map_handler, kf_poses_host
                        ) -> Optional[np.ndarray]:
        """Optimize the pose graph and return the corrected FULL (F,4,4)
        pose array (host), WITHOUT applying it to the map state (the
        caller fuses the application with landmark fusion + window LBA).

        The graph is cropped to the smallest power-of-two slot bucket
        covering the used KFs: the dense (6F')^2 solve is the cost
        center, and solving max_kfs=512 slots (3072^2 LU, ~300 ms/call
        on chip) for a 30-KF session is two orders of magnitude of
        waste. Buckets keep the jit signature count bounded.
        """
        cfg = self.cfg
        F = cfg.mapping.max_kfs
        with map_handler._lock:
            state = map_handler.state
            # authoritative KF count from the DEVICE state: with pipelined
            # fused chunks, a later chunk's insertions may already be in
            # the stream ahead of this settle, and the host counter lags
            n_used = int(jax.device_get(state.n_kfs))
        Fb = 64
        while Fb < min(n_used, F):
            Fb *= 2
        Fb = min(Fb, F)
        E = 4 * Fb
        with map_handler._lock:
            state = map_handler.state
            poses = state.kf_pose[:Fb]
            pose_valid = state.kf_valid[:Fb]

        # odometry + loop edges are load-bearing; covis edges last —
        # weakest (fewest shared landmarks) first to be truncated, and the
        # drop count is surfaced (never silent)
        covis = sorted(self.covis_edges, key=lambda e: -e[4])
        edges = self.odo_edges + self.loop_edges + [e[:4] for e in covis]
        dropped = max(0, len(edges) - E)
        if dropped > self.n_edges_dropped:
            print(f"[loop_closer] pose-graph edge cap E={E}: dropping "
                  f"{dropped} weakest covisibility edges")
        self.n_edges_dropped = max(self.n_edges_dropped, dropped)
        ei = np.full((E,), 0, np.int32)
        ej = np.full((E,), 0, np.int32)
        eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        ew = np.zeros((E,), np.float32)
        for n, (i, j, T, w) in enumerate(edges[:E]):
            ei[n], ej[n], eT[n], ew[n] = i, j, T, w

        g = PoseGraph(poses=poses, pose_valid=pose_valid,
                      edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                      edge_T=jnp.asarray(eT), edge_w=jnp.asarray(ew))
        # gauge-connectivity telemetry: disconnected KFs are frozen by
        # the solvers (pose_graph.frozen_mask); any occurrence means
        # edges were lost (e.g. at compaction) and is worth a loud line
        frz = frozen_mask(g)
        n_frz = int(frz.sum())
        if n_frz:
            self.n_frozen_events += 1
            print(f"[loop_closer] pose graph: {n_frz} keyframe(s) "
                  "disconnected from the gauge component — frozen at "
                  "current estimates (edges lost at compaction?)")
        # past the dense wall (the (6Fb)^2 LU is O(Fb^3): ~300 ms at
        # Fb=512 on chip) the matrix-free PCG solver takes over — the
        # g2o-sparse-solver role; see pose_graph.optimize_pose_graph_pcg
        solver = cfg.loop.pose_graph_solver
        if solver == "auto":
            solver = ("dense" if Fb <= cfg.loop.pose_graph_dense_max
                      else "pcg")
        if solver == "pcg":
            new_d, c0, c1 = optimize_pose_graph_pcg(
                g, iters=cfg.loop.pose_graph_iters,
                cg_iters=cfg.loop.pose_graph_cg_iters)
        else:
            new_d, c0, c1 = optimize_pose_graph(
                g, iters=cfg.loop.pose_graph_iters)
        new_np, c0, c1, valid_np, old_np = jax.device_get(  # ONE round trip
            (new_d, c0, c1, pose_valid, poses))
        self._last_costs = (float(c0), float(c1))
        new_np = np.array(new_np)       # writable host copy
        if not np.all(np.isfinite(new_np)):
            return None
        # KFs inserted after the probe snapshot have no graph edges yet
        # (zero H block -> the optimizer leaves them untouched): they are
        # rigidly attached by odometry, so propagate the last connected
        # KF's correction — otherwise the next odometry edge would mix
        # corrected and stale frames and the graph never re-converges
        n_edges = min(len(edges), E)
        if n_edges:
            last = int(max(ei[:n_edges].max(), ej[:n_edges].max()))
            delta = new_np[last] @ np.linalg.inv(old_np[last])
            for s in range(last + 1, len(new_np)):
                if valid_np[s]:
                    new_np[s] = delta @ old_np[s]
        # un-crop against the CURRENT device poses (NOT the settle-time
        # snapshot): pipelined fused chunks may have inserted KFs beyond
        # this settle already, and writing snapshot rows back would wipe
        # their fresh poses. old_np above is also current-state, so the
        # edge-less tail got the same delta propagation.
        with map_handler._lock:
            full = np.array(jax.device_get(map_handler.state.kf_pose),
                            np.float32)
        full[:Fb] = new_np
        return full
