"""Global map state + keyframe insertion, map matching, triangulation,
landmark culling — all as functional updates on fixed-capacity arrays.

Reference parity: pl-slam ``src/mapFeatures.cpp`` (MapPoint/MapLine with
observation lists and representative descriptors), ``src/keyFrame.cpp``
(KeyFrame records) and the bookkeeping half of ``src/mapHandler.cpp``:
``addKeyFrame``, ``lookForCommonMatches`` (project local map into the
new KF and match), landmark triangulation/expansion
(``expandMapPoints``/``expandMapLines`` roles), ``removeBadMapLandmarks``.

The C++ pointer graph (KeyFrame* / MapPoint* with obs lists) becomes a
slot-indexed SoA: keyframe slot w observes landmark ``obs_pt_lm[w, k]``
through feature slot k. That index table IS the sparse observation
graph, consumed directly by backend.lba.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineObservations, PointObservations
from plslam_tpu.ops import hamming
from plslam_tpu.ops.gather import take_mxu


class MapState(NamedTuple):
    # keyframes
    kf_pose: jnp.ndarray        # (F, 4, 4) T_w_kf (kf-to-world)
    kf_valid: jnp.ndarray       # (F,)
    n_kfs: jnp.ndarray          # () int32 — next slot
    # map points
    pt_pos: jnp.ndarray         # (P, 3) world
    pt_desc: jnp.ndarray        # (P, 256) uint8 representative descriptor
    pt_valid: jnp.ndarray       # (P,)
    pt_nobs: jnp.ndarray        # (P,) int32
    pt_last_kf: jnp.ndarray     # (P,) int32
    pt_first_kf: jnp.ndarray    # (P,) int32
    pt_desc_ring: jnp.ndarray   # (P, R, 8) uint32 — last R packed obs
    pt_ring_n: jnp.ndarray      # (P,) int32 monotonic ring-write count
                                #   (pt_nobs moves with retirement/fusion
                                #    and must not drive the ring cursor)
    pt_dir: jnp.ndarray         # (P, 3) mean viewing direction (unit)
    # map lines (3D endpoint pairs)
    ln_spos: jnp.ndarray        # (M, 3)
    ln_epos: jnp.ndarray        # (M, 3)
    ln_desc: jnp.ndarray        # (M, 256) uint8
    ln_valid: jnp.ndarray
    ln_nobs: jnp.ndarray
    ln_last_kf: jnp.ndarray
    ln_first_kf: jnp.ndarray
    ln_desc_ring: jnp.ndarray   # (M, R, 8) uint32
    ln_ring_n: jnp.ndarray      # (M,) int32 monotonic ring-write count
    ln_dir: jnp.ndarray         # (M, 3)
    # per-KF observations (the sparse obs graph, dense-slotted)
    obs_pt_uv: jnp.ndarray      # (F, K, 2)
    obs_pt_disp: jnp.ndarray    # (F, K)
    obs_pt_lm: jnp.ndarray      # (F, K) int32 -> point slot or -1
    obs_ln_le: jnp.ndarray      # (F, L, 3)
    obs_ln_lm: jnp.ndarray      # (F, L) int32 -> line slot or -1
    obs_ln_ends: jnp.ndarray    # (F, L, 6) sp(2) ep(2) sdisp edisp
    # packed per-KF descriptors (for loop closure)
    kf_pt_desc: jnp.ndarray     # (F, K, 8) uint32 packed
    kf_ln_desc: jnp.ndarray     # (F, L, 8) uint32 packed


def init_map_state(cfg: SlamConfig) -> MapState:
    m = cfg.mapping
    F, P, M = m.max_kfs, m.max_points, m.max_lines
    K, L = cfg.points.max_kpts, cfg.lines.max_lines
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=f32), (F, 1, 1)),
        kf_valid=jnp.zeros((F,), bool),
        n_kfs=jnp.asarray(0, i32),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_desc=jnp.zeros((P, 256), jnp.uint8),
        pt_valid=jnp.zeros((P,), bool),
        pt_nobs=jnp.zeros((P,), i32),
        pt_last_kf=jnp.full((P,), -1, i32),
        pt_first_kf=jnp.full((P,), -1, i32),
        pt_desc_ring=jnp.zeros((P, m.desc_ring, 8), jnp.uint32),
        pt_ring_n=jnp.zeros((P,), i32),
        pt_dir=jnp.zeros((P, 3), f32),
        ln_spos=jnp.zeros((M, 3), f32),
        ln_epos=jnp.zeros((M, 3), f32),
        ln_desc=jnp.zeros((M, 256), jnp.uint8),
        ln_valid=jnp.zeros((M,), bool),
        ln_nobs=jnp.zeros((M,), i32),
        ln_last_kf=jnp.full((M,), -1, i32),
        ln_first_kf=jnp.full((M,), -1, i32),
        ln_desc_ring=jnp.zeros((M, m.desc_ring, 8), jnp.uint32),
        ln_ring_n=jnp.zeros((M,), i32),
        ln_dir=jnp.zeros((M, 3), f32),
        obs_pt_uv=jnp.zeros((F, K, 2), f32),
        obs_pt_disp=jnp.zeros((F, K), f32),
        obs_pt_lm=jnp.full((F, K), -1, i32),
        obs_ln_le=jnp.zeros((F, L, 3), f32),
        obs_ln_lm=jnp.full((F, L), -1, i32),
        obs_ln_ends=jnp.zeros((F, L, 6), f32),
        kf_pt_desc=jnp.zeros((F, K, 8), jnp.uint32),
        kf_ln_desc=jnp.zeros((F, L, 8), jnp.uint32),
    )


def _medoid_desc(ring: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Representative descriptor per landmark: the ring member with the
    minimum summed Hamming distance to the other stored observations
    (the 'median descriptor' of mapFeatures.cpp::updateAverageDescDir).

    ring (N, R, 8) uint32 packed, count (N,) valid entries. -> (N, 8).
    """
    R = ring.shape[1]
    x = ring[:, :, None, :] ^ ring[:, None, :, :]
    d = jnp.sum(jax.lax.population_count(x), axis=-1)          # (N, R, R)
    valid = jnp.arange(R)[None, :] < jnp.minimum(count, R)[:, None]
    mask = valid[:, :, None] & valid[:, None, :]
    dsum = jnp.sum(jnp.where(mask, d, 0), axis=1)              # (N, R)
    dsum = jnp.where(valid, dsum, jnp.int32(2 ** 30))
    mi = jnp.argmin(dsum, axis=1)
    return jnp.take_along_axis(ring, mi[:, None, None], axis=1)[:, 0]


def _view_dirs(pos: jnp.ndarray, cam_center: jnp.ndarray) -> jnp.ndarray:
    """Unit viewing directions camera-center -> landmark, (N, 3)."""
    v = pos - cam_center[None, :]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)


def _allocate_slots(free: jnp.ndarray, want: jnp.ndarray) -> jnp.ndarray:
    """Map the j-th wanted item to the j-th free slot.

    free: (N,) bool — slot availability. want: (K,) bool — items needing
    a slot. Returns (K,) int32 slot id or -1 when the pool is exhausted.
    """
    order = jnp.argsort(~free)                   # free slots first
    n_free = jnp.sum(free)
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    slot = jnp.where(want & (rank < n_free),
                     order[jnp.clip(rank, 0, free.shape[0] - 1)], -1)
    return slot.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg",))
def add_keyframe(state: MapState, pts: PointObservations,
                 lns: Optional[LineObservations], T_w_kf: jnp.ndarray,
                 cam: StereoCamera, cfg: SlamConfig
                 ) -> Tuple[MapState, dict]:
    """addKeyFrame + lookForCommonMatches + landmark expansion, fused.

    Writes the KF record, matches existing map landmarks to the new KF's
    features (projective window + descriptor NN), creates new landmarks
    from unmatched stereo features, and refreshes representative
    descriptors / observation counters.
    """
    mcfg = cfg.mapping
    mtch = cfg.matching
    F = state.kf_pose.shape[0]
    # capacity guard: at slot == F an unguarded scatter would CLAMP onto
    # slot F-1 and silently corrupt the newest KF. Instead the insert
    # becomes an in-program no-op (dropped writes, n_kfs frozen at F);
    # the drivers watch n_kfs and compact retired slots away
    # (compact_keyframes) or fail loudly before this can trigger.
    has_room = state.n_kfs < F
    slot = jnp.minimum(state.n_kfs, F - 1)
    gslot = jnp.where(has_room, slot, F)      # mode="drop" guard index
    T_cw = lie.inverse_se3(T_w_kf)

    cam_center = T_w_kf[:3, 3]

    # ---- match existing map points into this KF ------------------------
    uv_pred = cam.project(lie.transform_points(T_cw, state.pt_pos))
    z_pred = lie.transform_points(T_cw, state.pt_pos)[..., 2]
    recent = state.pt_last_kf >= slot - mcfg.window_kfs - mcfg.fixed_kfs
    # view-angle gate (updateAverageDescDir parity): a landmark only
    # matches from viewpoints within ~60 deg of its mean viewing
    # direction — descriptors are not viewpoint-invariant beyond that
    vdir_pt = _view_dirs(state.pt_pos, cam_center)
    dir_ok = ((state.pt_nobs < 1)    # direction set at first observation
              | (jnp.sum(state.pt_dir * vdir_pt, axis=-1)
                 > mcfg.view_cos_th))
    proj_ok = (state.pt_valid & recent & dir_ok & (z_pred > 0.5)
               & cam.in_image(uv_pred, margin=-20.0))
    dist = hamming.hamming_matrix(state.pt_desc, pts.desc, proj_ok, pts.valid,
                                  bf16=cfg.system.bf16_matching)
    win = hamming.window_mask(uv_pred, pts.uv, mtch.f2f_window)
    mres = hamming.match_nnr(hamming.apply_mask(dist, win),
                             mtch.max_hamming_p, mtch.min_ratio_12_p,
                             mutual=True)
    # mres: for each map point -> feature index (or -1)
    pt_matched = mres.valid & has_room                   # (P,)
    feat_of_pt = jnp.maximum(mres.idx, 0)
    # inverse view: for each feature -> matched map point (or -1)
    K = pts.uv.shape[0]
    scatter_idx = jnp.where(pt_matched, feat_of_pt, K)   # K = dropped
    feat_lm = jnp.full((K,), -1, jnp.int32).at[scatter_idx].set(
        jnp.arange(state.pt_pos.shape[0], dtype=jnp.int32), mode="drop")

    # ---- new landmarks from unmatched stereo features ------------------
    want_new = pts.valid & (feat_lm < 0) & has_room
    new_slot = _allocate_slots(~state.pt_valid, want_new)
    P_world = lie.transform_points(T_w_kf, pts.P)
    feat_lm = jnp.where(new_slot >= 0, new_slot, feat_lm)

    P_slots = state.pt_pos.shape[0]
    pts_packed = hamming.pack_bits(pts.desc)                   # (K, 8)
    ok_new = new_slot >= 0
    sidx = jnp.where(ok_new, new_slot, P_slots)  # drop OOB
    pt_pos = state.pt_pos.at[sidx].set(P_world, mode="drop")
    pt_valid = state.pt_valid.at[sidx].set(True, mode="drop")
    pt_nobs = state.pt_nobs.at[sidx].set(1, mode="drop")
    pt_first = state.pt_first_kf.at[sidx].set(slot, mode="drop")
    pt_last = state.pt_last_kf.at[sidx].set(slot, mode="drop")
    # new landmarks: descriptor ring starts at 0, direction = view dir
    vnew = _view_dirs(P_world, cam_center)
    pt_ring = state.pt_desc_ring.at[sidx, 0].set(pts_packed, mode="drop")
    pt_ring_n = state.pt_ring_n.at[sidx].set(1, mode="drop")
    pt_dir = state.pt_dir.at[sidx].set(vnew, mode="drop")

    # refresh matched landmarks: nobs, last_kf, descriptor ring (medoid
    # recomputed below), running mean viewing direction
    midx = jnp.where(pt_matched, jnp.arange(P_slots), P_slots)
    rpos = jnp.mod(state.pt_ring_n, state.pt_desc_ring.shape[1])
    pt_ring = pt_ring.at[midx, rpos].set(pts_packed[feat_of_pt],
                                         mode="drop")
    pt_ring_n = pt_ring_n.at[midx].add(1, mode="drop")
    dir_upd = (state.pt_dir * state.pt_nobs[:, None].astype(jnp.float32)
               + vdir_pt)
    dir_upd = dir_upd / jnp.maximum(
        jnp.linalg.norm(dir_upd, axis=-1, keepdims=True), 1e-9)
    pt_dir = jnp.where(pt_matched[:, None], dir_upd, pt_dir)
    pt_nobs = pt_nobs.at[midx].add(1, mode="drop")
    pt_last = pt_last.at[midx].set(slot, mode="drop")
    # representative descriptor = ring medoid (median-descriptor parity);
    # recomputed for every active landmark — (P, R, R) popcounts, cheap
    pt_desc = jnp.where(pt_valid[:, None],
                        hamming.unpack_bits(_medoid_desc(pt_ring, pt_ring_n)),
                        state.pt_desc)

    # ---- lines ---------------------------------------------------------
    if lns is not None:
        mid_pred = cam.project(lie.transform_points(
            T_cw, 0.5 * (state.ln_spos + state.ln_epos)))
        zmid = lie.transform_points(
            T_cw, 0.5 * (state.ln_spos + state.ln_epos))[..., 2]
        lrecent = state.ln_last_kf >= slot - mcfg.window_kfs - mcfg.fixed_kfs
        vdir_ln = _view_dirs(0.5 * (state.ln_spos + state.ln_epos),
                             cam_center)
        ldir_ok = ((state.ln_nobs < 1)
                   | (jnp.sum(state.ln_dir * vdir_ln, axis=-1)
                      > mcfg.view_cos_th))
        lproj_ok = (state.ln_valid & lrecent & ldir_ok & (zmid > 0.5)
                    & cam.in_image(mid_pred, margin=-40.0))
        ldist = hamming.hamming_matrix(state.ln_desc, lns.desc, lproj_ok,
                                       lns.valid, bf16=cfg.system.bf16_matching)
        lwin = hamming.window_mask(mid_pred, 0.5 * (lns.sp + lns.ep),
                                   mtch.f2f_window)
        lres = hamming.match_nnr(hamming.apply_mask(ldist, lwin),
                                 mtch.max_hamming_l, mtch.min_ratio_12_l,
                                 mutual=True)
        ln_matched = lres.valid & has_room
        feat_of_ln = jnp.maximum(lres.idx, 0)
        L = lns.sp.shape[0]
        lscatter_idx = jnp.where(ln_matched, feat_of_ln, L)
        lfeat_lm = jnp.full((L,), -1, jnp.int32).at[lscatter_idx].set(
            jnp.arange(state.ln_spos.shape[0], dtype=jnp.int32), mode="drop")
        lwant_new = lns.valid & (lfeat_lm < 0) & has_room
        lnew_slot = _allocate_slots(~state.ln_valid, lwant_new)
        lfeat_lm = jnp.where(lnew_slot >= 0, lnew_slot, lfeat_lm)
        sP_w = lie.transform_points(T_w_kf, lns.sP)
        eP_w = lie.transform_points(T_w_kf, lns.eP)
        M_slots = state.ln_spos.shape[0]
        lns_packed = hamming.pack_bits(lns.desc)
        lsidx = jnp.where(lnew_slot >= 0, lnew_slot, M_slots)
        ln_spos = state.ln_spos.at[lsidx].set(sP_w, mode="drop")
        ln_epos = state.ln_epos.at[lsidx].set(eP_w, mode="drop")
        ln_valid = state.ln_valid.at[lsidx].set(True, mode="drop")
        ln_nobs = state.ln_nobs.at[lsidx].set(1, mode="drop")
        ln_first = state.ln_first_kf.at[lsidx].set(slot, mode="drop")
        ln_last = state.ln_last_kf.at[lsidx].set(slot, mode="drop")
        lvnew = _view_dirs(0.5 * (sP_w + eP_w), cam_center)
        ln_ring = state.ln_desc_ring.at[lsidx, 0].set(lns_packed, mode="drop")
        ln_ring_n = state.ln_ring_n.at[lsidx].set(1, mode="drop")
        ln_dir = state.ln_dir.at[lsidx].set(lvnew, mode="drop")
        lmidx = jnp.where(ln_matched, jnp.arange(M_slots), M_slots)
        lrpos = jnp.mod(state.ln_ring_n, state.ln_desc_ring.shape[1])
        ln_ring = ln_ring.at[lmidx, lrpos].set(lns_packed[feat_of_ln],
                                               mode="drop")
        ln_ring_n = ln_ring_n.at[lmidx].add(1, mode="drop")
        ldir_upd = (state.ln_dir * state.ln_nobs[:, None].astype(jnp.float32)
                    + vdir_ln)
        ldir_upd = ldir_upd / jnp.maximum(
            jnp.linalg.norm(ldir_upd, axis=-1, keepdims=True), 1e-9)
        ln_dir = jnp.where(ln_matched[:, None], ldir_upd, ln_dir)
        ln_nobs = ln_nobs.at[lmidx].add(1, mode="drop")
        ln_last = ln_last.at[lmidx].set(slot, mode="drop")
        ln_desc = jnp.where(
            ln_valid[:, None],
            hamming.unpack_bits(_medoid_desc(ln_ring, ln_ring_n)),
            state.ln_desc)
        obs_ln_le = state.obs_ln_le.at[gslot].set(lns.le, mode="drop")
        obs_ln_lm = state.obs_ln_lm.at[gslot].set(
            jnp.where(lns.valid, lfeat_lm, -1), mode="drop")
        # disparities masked to 0 for invalid detections: downstream
        # consumers (loop verification) use ends[:, 4] > 0 as validity
        obs_ln_ends = state.obs_ln_ends.at[gslot].set(
            jnp.concatenate([lns.sp, lns.ep,
                             jnp.where(lns.valid, lns.sdisp, 0.0)[:, None],
                             jnp.where(lns.valid, lns.edisp, 0.0)[:, None]],
                            axis=-1), mode="drop")
        kf_ln_desc = state.kf_ln_desc.at[gslot].set(lns_packed, mode="drop")
        n_ln_matched = jnp.sum(ln_matched)
    else:
        ln_spos, ln_epos = state.ln_spos, state.ln_epos
        ln_desc, ln_valid = state.ln_desc, state.ln_valid
        ln_nobs, ln_last, ln_first = (state.ln_nobs, state.ln_last_kf,
                                      state.ln_first_kf)
        ln_ring, ln_ring_n, ln_dir = (state.ln_desc_ring, state.ln_ring_n,
                                      state.ln_dir)
        obs_ln_le, obs_ln_lm = state.obs_ln_le, state.obs_ln_lm
        obs_ln_ends, kf_ln_desc = state.obs_ln_ends, state.kf_ln_desc
        n_ln_matched = jnp.asarray(0)

    # ---- write the KF record -------------------------------------------
    new_state = state._replace(
        kf_pose=state.kf_pose.at[gslot].set(T_w_kf, mode="drop"),
        kf_valid=state.kf_valid.at[gslot].set(True, mode="drop"),
        n_kfs=state.n_kfs + has_room.astype(jnp.int32),
        pt_pos=pt_pos, pt_desc=pt_desc, pt_valid=pt_valid, pt_nobs=pt_nobs,
        pt_last_kf=pt_last, pt_first_kf=pt_first,
        pt_desc_ring=pt_ring, pt_ring_n=pt_ring_n, pt_dir=pt_dir,
        ln_spos=ln_spos, ln_epos=ln_epos, ln_desc=ln_desc, ln_valid=ln_valid,
        ln_nobs=ln_nobs, ln_last_kf=ln_last, ln_first_kf=ln_first,
        ln_desc_ring=ln_ring, ln_ring_n=ln_ring_n, ln_dir=ln_dir,
        obs_pt_uv=state.obs_pt_uv.at[gslot].set(pts.uv, mode="drop"),
        obs_pt_disp=state.obs_pt_disp.at[gslot].set(
            jnp.where(pts.valid, pts.disp, 0.0), mode="drop"),
        obs_pt_lm=state.obs_pt_lm.at[gslot].set(
            jnp.where(pts.valid, feat_lm, -1), mode="drop"),
        obs_ln_le=obs_ln_le, obs_ln_lm=obs_ln_lm, obs_ln_ends=obs_ln_ends,
        kf_pt_desc=state.kf_pt_desc.at[gslot].set(pts_packed, mode="drop"),
        kf_ln_desc=kf_ln_desc,
    )
    diag = {"n_map_matches": jnp.sum(pt_matched & pts.valid[feat_of_pt]),
            "n_new_points": jnp.sum(ok_new),
            "n_ln_matches": n_ln_matched,
            "kf_slot": slot}
    return new_state, diag


@partial(jax.jit, static_argnames=("cfg",))
def remove_redundant_kfs(state: MapState, cfg: SlamConfig) -> Tuple[MapState, jnp.ndarray]:
    """removeRedundantKFs parity: a window KF most of whose landmarks are
    redundantly observed (>= 4 observers) is retired — its observations
    detach (obs counters decremented) and it stops being a BA variable.
    The newest KF and the first KF are never removed. Returns
    (state, n_removed)."""
    m = cfg.mapping
    span = m.window_kfs
    F = state.kf_pose.shape[0]
    # candidate slots: inside the local window, excluding the newest
    slots = jnp.clip(state.n_kfs - 1 - jnp.arange(1, span), 0, F - 1)

    def redundancy(slot):
        lm = state.obs_pt_lm[slot]
        ok = lm >= 0
        nobs = state.pt_nobs[jnp.maximum(lm, 0)]
        well_obs = ok & (nobs >= 4)
        frac = jnp.sum(well_obs) / jnp.maximum(jnp.sum(ok), 1)
        return frac

    fracs = jax.vmap(redundancy)(slots)
    removable = ((fracs > m.max_common_fts_kf)
                 & (slots > 0) & state.kf_valid[slots])
    # remove at most one KF per call (the most redundant) — matches the
    # incremental behavior of the reference and keeps the update simple
    best = jnp.argmax(jnp.where(removable, fracs, -1.0))
    do = jnp.any(removable)
    slot = slots[best]

    lm = state.obs_pt_lm[slot]
    dec_idx = jnp.where((lm >= 0) & do, lm, state.pt_pos.shape[0])
    pt_nobs = state.pt_nobs.at[dec_idx].add(-1, mode="drop")
    llm = state.obs_ln_lm[slot]
    ldec = jnp.where((llm >= 0) & do, llm, state.ln_spos.shape[0])
    ln_nobs = state.ln_nobs.at[ldec].add(-1, mode="drop")
    new_state = state._replace(
        kf_valid=state.kf_valid.at[slot].set(
            jnp.where(do, False, state.kf_valid[slot])),
        obs_pt_lm=state.obs_pt_lm.at[slot].set(
            jnp.where(do, jnp.full_like(lm, -1), lm)),
        obs_ln_lm=state.obs_ln_lm.at[slot].set(
            jnp.where(do, jnp.full_like(llm, -1), llm)),
        pt_nobs=pt_nobs, ln_nobs=ln_nobs)
    return new_state, do.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "max_retire"))
def remove_redundant_kfs_global(state: MapState, cfg: SlamConfig,
                                max_retire: int = 4
                                ) -> Tuple[MapState, jnp.ndarray]:
    """GLOBAL redundant-KF sweep (the reference's removeRedundantKFs
    scans covisible KFs anywhere in the map, not just the local window —
    the window-local pass never retires old KFs once the trajectory
    moves on). Retires up to ``max_retire`` KFs per call, most-redundant
    first. The observer threshold (max_retire + min_lm_obs) is stricter than the window pass's
    4: even if every retired KF observed the same landmark, its count
    stays at or above the culling floor — joint retirements cannot
    destroy a still-useful landmark. Returns (state, n_removed)."""
    m = cfg.mapping
    F = state.kf_pose.shape[0]
    newest = state.n_kfs - 1
    slots_arr = jnp.arange(F)

    lm = state.obs_pt_lm                                     # (F, K)
    ok = lm >= 0
    nobs = take_mxu(state.pt_nobs, jnp.maximum(lm, 0))       # (F, K)
    well = ok & (nobs >= max_retire + m.min_lm_obs)
    frac = jnp.sum(well, axis=1) / jnp.maximum(jnp.sum(ok, axis=1), 1)
    removable = ((frac > m.max_common_fts_kf) & state.kf_valid
                 & (slots_arr > 0) & (slots_arr != newest)
                 & (slots_arr < state.n_kfs))
    vals, cand = jax.lax.top_k(jnp.where(removable, frac, -1.0), max_retire)
    do = vals > 0

    kf_valid = state.kf_valid
    pt_nobs = state.pt_nobs
    ln_nobs = state.ln_nobs
    obs_pt_lm = state.obs_pt_lm
    obs_ln_lm = state.obs_ln_lm
    P = state.pt_pos.shape[0]
    M = state.ln_spos.shape[0]
    for j in range(max_retire):
        slot = cand[j]
        lm_r = obs_pt_lm[slot]
        dec = jnp.where((lm_r >= 0) & do[j], lm_r, P)
        pt_nobs = pt_nobs.at[dec].add(-1, mode="drop")
        llm_r = obs_ln_lm[slot]
        ldec = jnp.where((llm_r >= 0) & do[j], llm_r, M)
        ln_nobs = ln_nobs.at[ldec].add(-1, mode="drop")
        obs_pt_lm = obs_pt_lm.at[slot].set(
            jnp.where(do[j], jnp.full_like(lm_r, -1), lm_r))
        obs_ln_lm = obs_ln_lm.at[slot].set(
            jnp.where(do[j], jnp.full_like(llm_r, -1), llm_r))
        kf_valid = kf_valid.at[slot].set(
            jnp.where(do[j], False, kf_valid[slot]))
    new_state = state._replace(kf_valid=kf_valid, pt_nobs=pt_nobs,
                               ln_nobs=ln_nobs, obs_pt_lm=obs_pt_lm,
                               obs_ln_lm=obs_ln_lm)
    return new_state, jnp.sum(do)


@partial(jax.jit, static_argnames=("cfg", "n_retire"))
def force_retire_kfs(state: MapState, cfg: SlamConfig, n_retire: int
                     ) -> Tuple[MapState, jnp.ndarray]:
    """Memory-pressure eviction: retire up to ``n_retire`` keyframes
    even below the redundancy bar, most-redundant-then-oldest first.

    Used only when the slot array is nearly full and the regular sweeps
    (which honor the reference's max_common_fts_kf criterion) freed
    nothing — i.e. the sequence is genuinely non-redundant and longer
    than ``max_kfs``. The reference has no equivalent because its KF
    vector grows without bound in RAM; with fixed-capacity state the
    honest choice under pressure is to evict the KFs whose observations
    the map can best afford to lose (highest fraction of multiply-
    observed landmarks, oldest on ties). Protected: slot 0 (gauge), the
    LBA window+fixed span, the newest KF. Returns (state, n_removed)."""
    m = cfg.mapping
    F = state.kf_pose.shape[0]
    slots_arr = jnp.arange(F)
    newest = state.n_kfs - 1
    span = m.window_kfs + m.fixed_kfs

    lm = state.obs_pt_lm                                     # (F, K)
    ok = lm >= 0
    nobs = take_mxu(state.pt_nobs, jnp.maximum(lm, 0))       # (F, K)
    well = ok & (nobs >= m.min_lm_obs)
    frac = jnp.sum(well, axis=1) / jnp.maximum(jnp.sum(ok, axis=1), 1)
    removable = (state.kf_valid & (slots_arr > 0)
                 & (slots_arr < state.n_kfs - span)
                 & (slots_arr != newest))
    # redundancy first; among comparably-redundant KFs, evict an
    # INTERLEAVED set (odd slots first) rather than a contiguous
    # oldest block: deleting a whole temporal era removes every loop
    # anchor and landmark first-observer of that era, and long-run
    # endurance tests showed the trajectory tail paying for it (round
    # 5: a contiguous 64-KF eviction preceded a 4x ATE cliff in the
    # final lap). Halving the observation density of the old era keeps
    # its coverage. The odd-slot bonus (0.1) only reorders KFs whose
    # redundancy differs by less than that; the tiny age term breaks
    # remaining ties oldest-first.
    score = jnp.where(removable,
                      frac + 0.1 * (slots_arr % 2).astype(frac.dtype)
                      - 1e-4 * slots_arr, -jnp.inf)
    vals, cand = jax.lax.top_k(score, n_retire)
    do = jnp.isfinite(vals)

    kf_valid = state.kf_valid
    pt_nobs = state.pt_nobs
    ln_nobs = state.ln_nobs
    obs_pt_lm = state.obs_pt_lm
    obs_ln_lm = state.obs_ln_lm
    P = state.pt_pos.shape[0]
    M = state.ln_spos.shape[0]
    for j in range(n_retire):
        slot = cand[j]
        lm_r = obs_pt_lm[slot]
        dec = jnp.where((lm_r >= 0) & do[j], lm_r, P)
        pt_nobs = pt_nobs.at[dec].add(-1, mode="drop")
        llm_r = obs_ln_lm[slot]
        ldec = jnp.where((llm_r >= 0) & do[j], llm_r, M)
        ln_nobs = ln_nobs.at[ldec].add(-1, mode="drop")
        obs_pt_lm = obs_pt_lm.at[slot].set(
            jnp.where(do[j], jnp.full_like(lm_r, -1), lm_r))
        obs_ln_lm = obs_ln_lm.at[slot].set(
            jnp.where(do[j], jnp.full_like(llm_r, -1), llm_r))
        kf_valid = kf_valid.at[slot].set(
            jnp.where(do[j], False, kf_valid[slot]))
    new_state = state._replace(kf_valid=kf_valid, pt_nobs=pt_nobs,
                               ln_nobs=ln_nobs, obs_pt_lm=obs_pt_lm,
                               obs_ln_lm=obs_ln_lm)
    return new_state, jnp.sum(do)


@partial(jax.jit, static_argnames=())
def compact_keyframes(state: MapState) -> Tuple[MapState, jnp.ndarray,
                                                jnp.ndarray, jnp.ndarray]:
    """Order-preserving KF-slot compaction: drop retired (invalid)
    slots, shift survivors down, freeing the tail for new keyframes.

    The reference runs unbounded sequences because retired KeyFrames are
    actually deleted (mapHandler.cpp :: removeRedundantKFs); with
    fixed-capacity slot arrays the equivalent is this compaction, run by
    the driver when ``n_kfs`` approaches ``max_kfs`` (rare, stop-the-
    world — the host must remap its slot-valued records, see
    FusedPLSLAM._compact). Slot ORDER is time order everywhere (window
    selection, recency gates, covisibility direction), and compaction
    preserves it.

    Returns (state, exact_map (F,), floor_map (F,), n_valid) where
    exact_map[old] = new slot or -1 for dropped slots, and
    floor_map[old] = new slot of the nearest surviving KF at-or-before
    ``old`` (-1 if none) — the right semantics for time-anchored
    references like pt_first_kf.
    """
    F = state.kf_pose.shape[0]
    idx = jnp.arange(F, dtype=jnp.int32)
    valid = state.kf_valid & (idx < state.n_kfs)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    inc = jnp.cumsum(valid.astype(jnp.int32))            # inclusive
    exact_map = jnp.where(valid, inc - 1, -1)
    floor_map = jnp.where(inc > 0, inc - 1, -1)
    # survivors in original order, then the dropped slots
    perm = jnp.argsort(jnp.where(valid, idx, F + idx)).astype(jnp.int32)
    live = idx < n_valid

    def g(a, fill):
        out = jnp.take(a, perm, axis=0)
        shape = (F,) + (1,) * (a.ndim - 1)
        return jnp.where(live.reshape(shape), out,
                         jnp.asarray(fill, a.dtype))

    eye = jnp.broadcast_to(jnp.eye(4, dtype=state.kf_pose.dtype),
                           state.kf_pose.shape)
    kf_pose = jnp.where(live[:, None, None], state.kf_pose[perm], eye)

    remap_time = lambda t: jnp.where(
        t >= 0, floor_map[jnp.clip(t, 0, F - 1)], -1)
    return state._replace(
        kf_pose=kf_pose,
        kf_valid=live,
        n_kfs=n_valid,
        pt_first_kf=remap_time(state.pt_first_kf),
        pt_last_kf=remap_time(state.pt_last_kf),
        ln_first_kf=remap_time(state.ln_first_kf),
        ln_last_kf=remap_time(state.ln_last_kf),
        obs_pt_uv=g(state.obs_pt_uv, 0.0),
        obs_pt_disp=g(state.obs_pt_disp, 0.0),
        obs_pt_lm=g(state.obs_pt_lm, -1),
        obs_ln_le=g(state.obs_ln_le, 0.0),
        obs_ln_lm=g(state.obs_ln_lm, -1),
        obs_ln_ends=g(state.obs_ln_ends, 0.0),
        kf_pt_desc=g(state.kf_pt_desc, 0),
        kf_ln_desc=g(state.kf_ln_desc, 0),
    ), exact_map, floor_map, n_valid


@partial(jax.jit, static_argnames=("cfg",))
def fuse_loop_landmarks(state: MapState, slot_a: jnp.ndarray,
                        slot_b: jnp.ndarray, cfg: SlamConfig
                        ) -> Tuple[MapState, jnp.ndarray]:
    """loopClosureFuseLandmarks parity (fusion half): after the pose-graph
    correction, landmarks observed by the two loop KFs that match by
    descriptor and lie close in 3D are duplicates — merge into the older
    slot and redirect every observation table entry. Both families fuse
    (the reference fuses MapPoints AND MapLines)."""
    P = state.pt_pos.shape[0]
    lm_a = state.obs_pt_lm[slot_a]
    lm_b = state.obs_pt_lm[slot_b]
    ok_a = lm_a >= 0
    ok_b = lm_b >= 0
    desc_a = hamming.unpack_bits(state.kf_pt_desc[slot_a].reshape(-1, 8))
    desc_b = hamming.unpack_bits(state.kf_pt_desc[slot_b].reshape(-1, 8))
    dist = hamming.hamming_matrix(desc_a, desc_b, ok_a, ok_b)
    mres = hamming.match_nnr(dist, cfg.matching.max_hamming_p,
                             cfg.matching.min_ratio_12_p, mutual=True)
    idx_b = jnp.maximum(mres.idx, 0)
    la = jnp.maximum(lm_a, 0)
    lb = jnp.maximum(lm_b[idx_b], 0)
    pa = state.pt_pos[la]
    pb = state.pt_pos[lb]
    close = jnp.sum((pa - pb) ** 2, axis=-1) < 0.25   # 0.5 m fuse radius
    fuse = (mres.valid & ok_a & (lm_b[idx_b] >= 0) & close
            & (la != lb))
    keep = jnp.minimum(la, lb)
    dup = jnp.maximum(la, lb)

    remap = jnp.arange(P, dtype=jnp.int32)
    remap = remap.at[jnp.where(fuse, dup, P)].set(
        jnp.where(fuse, keep, 0), mode="drop")
    # make the remap TRANSITIVE: slot x may be the dup of one pair and
    # the keep of another (remap[a]=b while remap[b]=c). Without the
    # closure, observations land on slot b — which the dup pass below
    # INVALIDATES — and when b is later reallocated to a brand-new
    # landmark, those stale rows silently re-bind to it (position
    # aliasing that LBA then optimizes against). Two pointer-jumping
    # hops resolve any chain the single-batch matcher can produce.
    remap = remap[remap]
    remap = remap[remap]
    o = state.obs_pt_lm
    obs_pt_lm = jnp.where(o >= 0, remap[jnp.maximum(o, 0)], -1)
    pt_valid = state.pt_valid & (remap == jnp.arange(P, dtype=jnp.int32))
    pt_nobs = state.pt_nobs.at[jnp.where(fuse, keep, P)].add(
        jnp.where(fuse, state.pt_nobs[dup], 0), mode="drop")
    state = state._replace(obs_pt_lm=obs_pt_lm, pt_valid=pt_valid,
                           pt_nobs=pt_nobs)

    # ---- line landmarks (LBD match + endpoint proximity) ----------------
    M = state.ln_spos.shape[0]
    llm_a = state.obs_ln_lm[slot_a]
    llm_b = state.obs_ln_lm[slot_b]
    lok_a = llm_a >= 0
    lok_b = llm_b >= 0
    ldesc_a = hamming.unpack_bits(state.kf_ln_desc[slot_a].reshape(-1, 8))
    ldesc_b = hamming.unpack_bits(state.kf_ln_desc[slot_b].reshape(-1, 8))
    ldist = hamming.hamming_matrix(ldesc_a, ldesc_b, lok_a, lok_b)
    lmres = hamming.match_nnr(ldist, cfg.matching.max_hamming_l,
                              cfg.matching.min_ratio_12_l, mutual=True)
    lidx_b = jnp.maximum(lmres.idx, 0)
    ma = jnp.maximum(llm_a, 0)
    mb = jnp.maximum(llm_b[lidx_b], 0)
    mida = 0.5 * (state.ln_spos[ma] + state.ln_epos[ma])
    midb = 0.5 * (state.ln_spos[mb] + state.ln_epos[mb])
    lclose = jnp.sum((mida - midb) ** 2, axis=-1) < 0.25
    lfuse = (lmres.valid & lok_a & (llm_b[lidx_b] >= 0) & lclose
             & (ma != mb))
    lkeep = jnp.minimum(ma, mb)
    ldup = jnp.maximum(ma, mb)
    lremap = jnp.arange(M, dtype=jnp.int32)
    lremap = lremap.at[jnp.where(lfuse, ldup, M)].set(
        jnp.where(lfuse, lkeep, 0), mode="drop")
    lremap = lremap[lremap]          # transitive closure (see points)
    lremap = lremap[lremap]
    lo = state.obs_ln_lm
    obs_ln_lm = jnp.where(lo >= 0, lremap[jnp.maximum(lo, 0)], -1)
    ln_valid = state.ln_valid & (lremap == jnp.arange(M, dtype=jnp.int32))
    ln_nobs = state.ln_nobs.at[jnp.where(lfuse, lkeep, M)].add(
        jnp.where(lfuse, state.ln_nobs[ldup], 0), mode="drop")
    state = state._replace(obs_ln_lm=obs_ln_lm, ln_valid=ln_valid,
                           ln_nobs=ln_nobs)
    return state, jnp.sum(fuse) + jnp.sum(lfuse)


@partial(jax.jit, static_argnames=("cfg",))
def cull_landmarks(state: MapState, cfg: SlamConfig) -> MapState:
    """removeBadMapLandmarks parity: drop landmarks that stopped being
    observed before reaching min_lm_obs observations — plus a
    POOL-PRESSURE tier (config: lm_pool_high_water/lm_pool_evict_frac):
    past the high water mark the weakest mature landmarks (fewest
    observations, oldest last-seen; window-recent protected) retire
    too, so a long sequence can keep mapping new structure instead of
    silently saturating (see MappingConfig for the measured failure
    mode)."""
    m = cfg.mapping
    cur = state.n_kfs - 1
    grace = 2  # KFs a landmark may stay unobserved while immature
    bad_pt = (state.pt_valid & (state.pt_nobs < m.min_lm_obs)
              & (state.pt_last_kf < cur - grace))
    bad_ln = (state.ln_valid & (state.ln_nobs < m.min_lm_obs)
              & (state.ln_last_kf < cur - grace))

    span = m.window_kfs + m.fixed_kfs

    def pressure(valid, nobs, last_kf, already_bad):
        P = valid.shape[0]
        n_evict = max(int(m.lm_pool_evict_frac * P), 1)
        occ = jnp.sum((valid & ~already_bad).astype(jnp.int32))
        over = occ > jnp.asarray(int(m.lm_pool_high_water * P),
                                 jnp.int32)
        removable = valid & ~already_bad & (last_kf < cur - span)
        # weakest first: fewest observations, oldest last-seen breaks
        # ties (score is maximized by eviction candidates)
        score = jnp.where(
            removable,
            -(nobs.astype(jnp.float32) * (2.0 * P)
              + last_kf.astype(jnp.float32)), -jnp.inf)
        vals, idx = jax.lax.top_k(score, n_evict)
        hit = jnp.zeros((P,), bool).at[idx].set(
            jnp.isfinite(vals), mode="drop")
        return jnp.where(over, hit, False)

    bad_pt = bad_pt | pressure(state.pt_valid, state.pt_nobs,
                               state.pt_last_kf, bad_pt)
    bad_ln = bad_ln | pressure(state.ln_valid, state.ln_nobs,
                               state.ln_last_kf, bad_ln)
    # detach every observation of a culled landmark: its slot will be
    # recycled, and a stale obs_pt_lm entry would silently re-bind old
    # KF observations to whatever landmark lands in the slot next
    # (corrupting LBA residuals and covisibility counts). The lookup
    # spans the FULL (F, K) obs table (~half a million indices) — the
    # native serialized gather cost ~5 ms/KF here; take_mxu makes it
    # an MXU contraction.
    obs_pt_lm = jnp.where(
        (state.obs_pt_lm >= 0)
        & (take_mxu(bad_pt.astype(jnp.float32),
                    jnp.maximum(state.obs_pt_lm, 0)) > 0.5),
        -1, state.obs_pt_lm)
    obs_ln_lm = jnp.where(
        (state.obs_ln_lm >= 0)
        & (take_mxu(bad_ln.astype(jnp.float32),
                    jnp.maximum(state.obs_ln_lm, 0)) > 0.5),
        -1, state.obs_ln_lm)
    return state._replace(pt_valid=state.pt_valid & ~bad_pt,
                          ln_valid=state.ln_valid & ~bad_ln,
                          obs_pt_lm=obs_pt_lm, obs_ln_lm=obs_ln_lm)
