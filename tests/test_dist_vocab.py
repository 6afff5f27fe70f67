"""Sharded place recognition (SURVEY §2.3 P7) as a SYSTEM capability:
equivalence of the mesh-sharded candidate retrieval with the
single-device query, and an end-to-end SLAM run closing loops through
it.

Reference parity: ``3rdparty/DBoW2`` ``TemplatedDatabase`` +
``mapHandler::lookForLoopCandidates`` — here scaled across a 1D 'kf'
device mesh (parallel.dist_vocab.DistRetrieval, wired to the live
LoopCloser by ``loop.distributed``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.loop.database import select_candidates


def _cfg(F=64, sep=12, k=4):
    return SlamConfig().with_updates({
        "mapping": {"max_kfs": F},
        "loop": {"min_kf_separation": sep, "max_loop_candidates": k,
                 "distributed": True, "dist_devices": 8},
    })


def test_dist_retrieval_candidates_equal_host():
    """For random BoW databases and many (slot, n_kfs) query points the
    sharded top-k + baseline must reproduce select_candidates exactly
    (same slots, same relative scores)."""
    from plslam_tpu.parallel.dist_vocab import DistRetrieval
    cfg = _cfg()
    F, D_p, D_l = 64, 96, 48
    rng = np.random.default_rng(0)
    bows_p = rng.random((F, D_p)).astype(np.float32)
    bows_l = rng.random((F, D_l)).astype(np.float32)
    bows_p /= bows_p.sum(-1, keepdims=True)
    bows_l /= bows_l.sum(-1, keepdims=True)

    dist = DistRetrieval(cfg, D_p, D_l)
    for s in range(F):
        dist.insert(s, jnp.asarray(bows_p[s]), jnp.asarray(bows_l[s]))

    def host_scores(slot):
        sp = 1.0 - 0.5 * np.abs(bows_p - bows_p[slot]).sum(-1)
        sl = 1.0 - 0.5 * np.abs(bows_l - bows_l[slot]).sum(-1)
        return (0.5 * (sp + sl)).astype(np.float32)

    for slot, n_kfs in [(20, 21), (35, 36), (63, 64), (13, 30), (50, 64)]:
        scores = host_scores(slot)
        scores[slot:] = 0.0
        scores[n_kfs:] = 0.0
        ref_cands, ref_base = select_candidates(scores, slot, cfg)

        ts, ti, base = jax.device_get(dist.query(
            slot, n_kfs, jnp.asarray(bows_p[slot]),
            jnp.asarray(bows_l[slot])))
        base = max(float(base), 1e-3)
        got = [(int(i), float(s) / base) for s, i in zip(ts, ti)
               if s > 0 and float(s) / base >= cfg.loop.lc_mat]

        assert base == pytest.approx(ref_base, rel=1e-5), (slot, n_kfs)
        assert [g[0] for g in got] == [c.slot for c in ref_cands], (
            slot, n_kfs, got, ref_cands)
        for (gs, gr), c in zip(
                [(g[0], g[1]) for g in got], ref_cands):
            assert gr == pytest.approx(c.score, rel=1e-4)


def test_dist_retrieval_remap_slots():
    """Compaction permutation: rows move exactly like the primary
    database's (LoopCloser.remap_slots contract)."""
    from plslam_tpu.parallel.dist_vocab import DistRetrieval
    cfg = _cfg()
    F, D = 64, 32
    rng = np.random.default_rng(1)
    bows = rng.random((F, D)).astype(np.float32)
    dist = DistRetrieval(cfg, D, None)
    for s in range(F):
        dist.insert(s, jnp.asarray(bows[s]))
    # drop every third slot
    exact = np.full((F,), -1, np.int32)
    new = 0
    for old in range(F):
        if old % 3 != 0:
            exact[old] = new
            new += 1
    perm = np.zeros((F,), np.int32)
    for old, nw in enumerate(exact):
        if nw >= 0:
            perm[nw] = old
    dist.remap_slots(perm, new)
    got = np.asarray(jax.device_get(dist.bows_p))
    for old, nw in enumerate(exact):
        if nw >= 0:
            np.testing.assert_array_equal(got[nw], bows[old])
    assert np.all(got[new:] == 0.0)


def test_slam_closes_loop_with_distributed_retrieval():
    """End-to-end: the circular-trajectory scene must close its loop
    with retrieval routed through the 8-device sharded database, and
    produce the SAME loop events and final KF count as the
    single-device path."""
    base = SlamConfig().with_updates({
        "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
                   "cx": 256.0, "cy": 160.0, "baseline": 0.3},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 128.0},
        "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                    "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
        "keyframe": {"min_entropy_ratio": 2.0},   # KF every frame
        "system": {"async_mapping": False},
        "loop": {"enabled": True, "min_kf_separation": 12,
                 "consistency_window": 2, "lc_inl": 15,
                 "lc_trs": 3.0, "lc_rot": 60.0},
    })
    cam = StereoCamera.from_config(base.camera)
    n = 40
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=0, noise=0.004,
                                  step=0.35)
    from plslam_tpu.backend.slam_system import PLSLAM

    def run(cfg):
        slam = PLSLAM(cfg, cam)
        slam.initialize(seq.images_l[0], seq.images_r[0])
        for i in range(1, n):
            slam.process(seq.images_l[i], seq.images_r[i])
        est = slam.finish()
        lc = slam.loop_closer
        events = [(e.kf_from, e.kf_to) for e in lc.events]
        return est, lc.n_loops_closed, events, slam._kf_slot + 1

    est_1, loops_1, ev_1, kfs_1 = run(base)
    est_d, loops_d, ev_d, kfs_d = run(base.with_updates(
        {"loop": {"distributed": True, "dist_devices": 8}}))
    assert loops_1 >= 1
    assert loops_d == loops_1
    assert ev_d == ev_1
    assert kfs_d == kfs_1
    d = max(np.linalg.norm(e1[:3, 3] - e2[:3, 3])
            for e1, e2 in zip(est_d, est_1))
    assert d < 1e-3, f"trajectory divergence {d:.5f} m"
