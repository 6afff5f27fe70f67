"""Fused per-chunk back-end: all of a chunk's keyframes processed in ONE
device program — per KF: feature slice out of the chunk stack, KF
insertion + map matching + triangulation (backend.map.add_keyframe),
windowed LBA, redundant-KF/landmark culling (backend.map_handler.
mapping_step) and the BoW place-recognition probe (loop.loop_closer.
probe_core) — with ONE host fetch for the whole chunk.

NEW vs the reference (a single-process CPU system with zero dispatch
cost): on tunnel-attached TPU runtimes every program dispatch costs
~20-30 ms of host latency. The per-KF path cost ~5 dispatches per
keyframe (2 feature slices, mapping_step, summary pose slice, BoW
probe) -> ~17 round trips per 20-frame chunk, capping full SLAM at
~21 fps with the device mostly idle. Fusing a chunk's 1..kmax keyframes
into one program + one fetch removes that wall; keyframes beyond kmax
in a single chunk are processed in a second dispatch.

Semantics match the sequential per-KF path exactly: the kmax slots are
processed in order inside the program (lax.cond masks unused slots), so
KF j+1's map matching sees KF j's insertions and LBA, like the worker
queue did.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from plslam_tpu.backend.map_handler import mapping_step_traced_lba
from plslam_tpu.core import lie
from plslam_tpu.ops import hamming


def backend_slots(state, bows_p, bows_l, all_pts, all_lns, frame_idx,
                  kf_valid, T_rels, cam, cfg, kmax: int, probe=None,
                  packed_desc: bool = True):
    """TRACEABLE slot loop shared by the standalone jitted chunk-backend
    step below and the fully-fused SLAM step (backend.fused_slam): per
    valid slot j, slice KF frame_idx[j]'s features out of the chunk
    stacks, insert RELATIVE to the previous KF's current map pose
    (T_rels[j] = tracker pose vs previous KF — delayed-correction
    pickup), run the fused mapping_step (+ BoW probe when ``probe``),
    lax.cond-skipping invalid slots. Returns (state, bows_p, bows_l,
    scores (kmax,F), covis (kmax,F), poses (kmax,4,4), stats (kmax,7)).

    stats rows: [lba_cost0, lba_cost1, n_map_matches, n_new_points,
    lba_pt_overflow, lba_ln_overflow, kf_slot]."""
    probe_on = probe is not None
    F = cfg.mapping.max_kfs

    def slice_frame(feats, i):
        out = jax.tree_util.tree_map(lambda x: jnp.take(x, i, axis=0), feats)
        if packed_desc:   # chunk stacks carry bit-packed descriptors
            out = out._replace(desc=hamming.unpack_bits(out.desc))
        return out

    # strided LBA (MappingConfig.lba_kf_stride): every slot inserts its
    # KF, but the window LBA + KF retirement run on every Nth valid
    # slot counted from the chunk's END — the last KF always solves, so
    # the window covers every insertion while the per-chunk LBA count
    # drops ~Nx (at the bench's ~2.7 KFs/chunk, stride 3 usually means
    # one LBA per chunk; stride 1 = the reference's per-KF cadence).
    stride = max(int(cfg.mapping.lba_kf_stride), 1)
    if stride > 1:
        rank = jnp.cumsum(kf_valid.astype(jnp.int32)) - 1
        n_valid = jnp.sum(kf_valid.astype(jnp.int32))
        from_end = n_valid - 1 - rank
        lba_flags = kf_valid & (jnp.mod(from_end, stride) == 0)
    else:
        lba_flags = kf_valid

    def do(ops, pts_j, lns_j, T_rel, lba_j):
        state, bows_p, bows_l = ops
        anchor = state.kf_pose[jnp.maximum(state.n_kfs - 1, 0)]
        T_w_kf = lie.mm(anchor, T_rel)
        state, diag, c0, c1, pt_ov, ln_ov = mapping_step_traced_lba(
            state, pts_j, lns_j, T_w_kf, cam, cfg, lba_j)
        slot = diag["kf_slot"]
        if probe_on:
            bows_p, bows_l, s, cv, pose = probe(
                state, bows_p, bows_l, slot)
        else:
            s = jnp.zeros((F,), jnp.float32)
            cv = jnp.zeros((F,), jnp.float32)
            pose = state.kf_pose[slot]
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        stat = jnp.stack([
            f32(c0), f32(c1), f32(diag["n_map_matches"]),
            f32(diag["n_new_points"]),
            f32(pt_ov), f32(ln_ov),
            f32(slot)])   # device-side KF slot: the host pipelines chunk
                          # submissions ahead of settles, so only the
                          # program knows the true slot numbering
        return state, bows_p, bows_l, (s, cv, pose, stat)

    def skip(ops, pts_j, lns_j, T_rel, lba_j):
        state, bows_p, bows_l = ops
        zero = (jnp.zeros((F,), jnp.float32),
                jnp.zeros((F,), jnp.float32),
                jnp.eye(4, dtype=jnp.float32),
                jnp.zeros((7,), jnp.float32))
        return state, bows_p, bows_l, zero

    # the kmax slots run as a lax.scan (not a Python unroll): every slot
    # traces the same mapping_step+probe body, so the scan compiles it
    # ONCE — kf_batch can grow without multiplying compile time
    def slot_body(carry, xs):
        idx_j, valid_j, T_rel_j, lba_j = xs
        pts_j = slice_frame(all_pts, idx_j)
        lns_j = (slice_frame(all_lns, idx_j)
                 if all_lns is not None else None)
        state, bows_p, bows_l, out_j = lax.cond(
            valid_j, do, skip, carry, pts_j, lns_j, T_rel_j, lba_j)
        return (state, bows_p, bows_l), out_j

    (state, bows_p, bows_l), (scores, covis, poses, stats) = lax.scan(
        slot_body, (state, bows_p, bows_l),
        (frame_idx, kf_valid, T_rels, lba_flags))
    return state, bows_p, bows_l, scores, covis, poses, stats


def make_chunk_backend(cam, cfg, kmax: int, voc_p=None, voc_l=None):
    """Build the jitted fused step.

    Returns fn(state, bows_p, bows_l, all_pts, all_lns, meta) ->
    (state, bows_p, bows_l, scores (kmax,F), covis (kmax,F),
     poses (kmax,4,4), stats (kmax,6)).

    T_rels[j] is the tracker-measured pose of KF j RELATIVE to the
    previous keyframe; the absolute insertion pose is composed in-program
    against the previous KF's CURRENT map pose (post-LBA, post-loop-
    correction). This is the reference's delayed correction pickup: the
    odometry chain is drift-consistent over a chunk, while the anchor
    carries every back-end correction — a new KF never re-enters the map
    at a stale pre-correction pose (which would break map matching and
    leave the pose graph inconsistent).

    When voc_p is None the probe is compiled out and scores/covis are
    zeros (pass (1,1) dummies for the bows).
    """
    probe = None
    if voc_p is not None:
        from plslam_tpu.loop.loop_closer import probe_core
        probe = partial(probe_core, voc_p, voc_l, cfg, cfg.lines.has_lines)

    @jax.jit
    def step(state, bows_p, bows_l, all_pts, all_lns, meta):
        # meta (kmax, 18): [frame_idx, valid, T_rel.flat(16)] — one packed
        # host->device transfer instead of three (each is an RPC)
        frame_idx = meta[:, 0].astype(jnp.int32)
        kf_valid = meta[:, 1] > 0.5
        T_rels = meta[:, 2:].reshape(kmax, 4, 4)
        return backend_slots(state, bows_p, bows_l, all_pts, all_lns,
                             frame_idx, kf_valid, T_rels, cam, cfg, kmax,
                             probe=probe, packed_desc=True)

    return step
