"""Map/LBA backend integration on synthetic sequences (BASELINE config 3:
'keyframe local bundle adjustment over sliding window of points+lines')."""

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.utils.evaluation import ate_rmse

CFG = SlamConfig().with_updates({
    "camera": {"width": 640, "height": 384, "fx": 450.0, "fy": 450.0,
               "cx": 320.0, "cy": 192.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 2},
    "lines": {"has_lines": False},
    "mapping": {"max_kfs": 64, "max_points": 2048, "max_lines": 256,
                "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 6},
    "keyframe": {"min_entropy_ratio": 2.0},  # force KF nearly every frame
    "system": {"async_mapping": False},
    "loop": {"enabled": False},
})
CAM = StereoCamera.from_config(CFG.camera)


def test_map_state_roundtrip():
    from plslam_tpu.backend.map import init_map_state, add_keyframe
    from plslam_tpu.frontend.stereo_points import extract_stereo_points

    seq = synthetic.make_sequence(CAM, n_frames=2, seed=11, n_points=200,
                                  n_lines=0, noise=0.003)
    state = init_map_state(CFG)
    pts = extract_stereo_points(jnp.asarray(seq.images_l[0]),
                                jnp.asarray(seq.images_r[0]), CAM, CFG)
    state, diag = add_keyframe(state, pts, None, jnp.eye(4), CAM, CFG)
    n_valid = int(jnp.sum(pts.valid))
    assert int(diag["n_new_points"]) == n_valid
    assert int(jnp.sum(state.pt_valid)) == n_valid
    assert int(state.n_kfs) == 1
    # second KF at the true relative pose: most features must match the map
    pts2 = extract_stereo_points(jnp.asarray(seq.images_l[1]),
                                 jnp.asarray(seq.images_r[1]), CAM, CFG)
    T01 = jnp.asarray(seq.poses[1])
    state, diag2 = add_keyframe(state, pts2, None, T01, CAM, CFG)
    n2 = int(jnp.sum(pts2.valid))
    assert int(diag2["n_map_matches"]) > 0.5 * n2, \
        (int(diag2["n_map_matches"]), n2)
    # new landmarks only for unmatched features
    assert int(diag2["n_new_points"]) <= n2 - int(diag2["n_map_matches"])


def test_slam_system_tracks_and_maps():
    from plslam_tpu.backend.slam_system import PLSLAM

    seq = synthetic.make_sequence(CAM, n_frames=10, seed=12, n_points=260,
                                  n_lines=0, noise=0.003, step=0.12)
    slam = PLSLAM(CFG)
    slam.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, 10):
        out = slam.process(seq.images_l[i], seq.images_r[i])
        assert out.frame.good
    est = slam.finish()
    assert est.shape[0] == 10
    a = ate_rmse(est, seq.poses)
    assert a < 0.05, f"SLAM ATE {a:.4f} m"
    n_pts, n_lns = slam.map.n_landmarks()
    assert n_pts > 100
    # LBA actually ran and reduced cost
    lba_runs = [s for s in slam.map.summaries if s.lba_cost0 > 0]
    assert lba_runs, "LBA never ran"
    assert all(s.lba_cost1 <= s.lba_cost0 for s in lba_runs)


def test_slam_async_mapping_matches_sync():
    from plslam_tpu.backend.slam_system import PLSLAM

    seq = synthetic.make_sequence(CAM, n_frames=8, seed=13, n_points=260,
                                  n_lines=0, noise=0.003, step=0.12)

    def run(async_flag):
        cfg = CFG.with_updates({"system": {"async_mapping": async_flag}})
        slam = PLSLAM(cfg)
        slam.initialize(seq.images_l[0], seq.images_r[0])
        for i in range(1, 8):
            slam.process(seq.images_l[i], seq.images_r[i])
        return slam.finish()

    est_sync = run(False)
    est_async = run(True)
    a_sync = ate_rmse(est_sync, seq.poses)
    a_async = ate_rmse(est_async, seq.poses)
    assert a_async < 0.08, f"async SLAM ATE {a_async:.4f}"
    assert a_sync < 0.08, f"sync SLAM ATE {a_sync:.4f}"


def test_cull_detaches_observations():
    """Culled landmarks must disappear from every KF's observation table:
    a stale obs_pt_lm entry would re-bind to whatever landmark is
    allocated into the recycled slot next (LBA/covisibility corruption)."""
    from plslam_tpu.backend.map import init_map_state, cull_landmarks

    state = init_map_state(CFG)
    # landmark 5: 1 obs, stale (last seen KF0, now at KF8) -> cull
    # landmark 6: mature (nobs=4)                          -> keep
    state = state._replace(
        n_kfs=jnp.asarray(9),
        pt_valid=state.pt_valid.at[5].set(True).at[6].set(True),
        pt_nobs=state.pt_nobs.at[5].set(1).at[6].set(4),
        pt_last_kf=state.pt_last_kf.at[5].set(0).at[6].set(0),
        obs_pt_lm=state.obs_pt_lm.at[0, 0].set(5).at[0, 1].set(6),
        obs_ln_lm=state.obs_ln_lm.at[0, 0].set(2),
        ln_valid=state.ln_valid.at[2].set(True),
        ln_nobs=state.ln_nobs.at[2].set(1),
        ln_last_kf=state.ln_last_kf.at[2].set(0),
    )
    out = cull_landmarks(state, CFG)
    assert not bool(out.pt_valid[5])
    assert bool(out.pt_valid[6])
    assert int(out.obs_pt_lm[0, 0]) == -1      # detached with the cull
    assert int(out.obs_pt_lm[0, 1]) == 6       # survivor untouched
    assert not bool(out.ln_valid[2])
    assert int(out.obs_ln_lm[0, 0]) == -1


def test_medoid_descriptor_rejects_outlier():
    """The representative descriptor must be the ring medoid: with two
    near-identical observations and one outlier, the outlier never wins
    (mapFeatures.cpp::updateAverageDescDir median-descriptor parity)."""
    from plslam_tpu.backend.map import _medoid_desc
    rng = np.random.default_rng(0)
    base = rng.integers(0, 2**32 - 1, 8, dtype=np.uint64).astype(np.uint32)
    near = base.copy()
    near[0] ^= np.uint32(1)          # 1 bit away
    outlier = ~base                   # 256 bits away
    ring = jnp.asarray(np.stack([base, outlier, near,
                                 np.zeros(8, np.uint32)])[None])
    med = np.asarray(_medoid_desc(ring, jnp.asarray([3])))[0]
    assert (med == base).all() or (med == near).all()
    # with a single entry, the medoid IS that entry
    med1 = np.asarray(_medoid_desc(ring, jnp.asarray([1])))[0]
    assert (med1 == base).all()


def test_view_direction_gate_blocks_opposite_view():
    """A landmark observed twice from the front must not match from the
    opposite side of the scene (view-angle gate, updateAverageDescDir
    parity)."""
    from plslam_tpu.backend.map import init_map_state, add_keyframe
    from plslam_tpu.frontend.stereo_points import extract_stereo_points
    from plslam_tpu.core import lie

    seq = synthetic.make_sequence(CAM, n_frames=2, seed=13, n_points=150,
                                  n_lines=0, noise=0.003, step=0.1)
    state = init_map_state(CFG)
    for f in range(2):
        pts = extract_stereo_points(jnp.asarray(seq.images_l[f]),
                                    jnp.asarray(seq.images_r[f]), CAM, CFG)
        state, diag = add_keyframe(state, pts, None,
                                   jnp.asarray(seq.poses[f]), CAM, CFG)
    assert int(diag["n_map_matches"]) > 30   # sanity: frontal re-matching

    # camera on the far side of the point cloud, looking back at it
    center = np.asarray(state.pt_pos)[np.asarray(state.pt_valid)].mean(0)
    T_back = np.eye(4, dtype=np.float32)
    T_back[:3, :3] = np.asarray(lie.exp_se3(
        jnp.asarray([0, 0, 0, 0.0, np.pi, 0.0])))[:3, :3]
    T_back[:3, 3] = center + np.array([0, 0, 2.0 * center[2]], np.float32)
    pts2 = extract_stereo_points(jnp.asarray(seq.images_l[1]),
                                 jnp.asarray(seq.images_r[1]), CAM, CFG)
    state2, diag2 = add_keyframe(state, pts2, None, jnp.asarray(T_back),
                                 CAM, CFG)
    # all map landmarks face the original camera; from behind, the view
    # gate must block (essentially) every match
    assert int(diag2["n_map_matches"]) < 5, int(diag2["n_map_matches"])
