"""Auxiliary subsystems: checkpoint/resume, visualization, redundant-KF
removal, landmark fusion."""

import os

import numpy as np
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.backend import checkpoint
from plslam_tpu.backend.map import (init_map_state, remove_redundant_kfs,
                                    fuse_loop_landmarks)

CFG = SlamConfig().with_updates({
    "points": {"max_kpts": 64},
    "lines": {"max_lines": 16},
    "mapping": {"max_kfs": 16, "max_points": 256, "max_lines": 32,
                "window_kfs": 4, "fixed_kfs": 1},
})


def test_checkpoint_roundtrip(tmp_path):
    state = init_map_state(CFG)
    state = state._replace(
        n_kfs=jnp.asarray(3),
        pt_pos=state.pt_pos.at[0].set(jnp.asarray([1.0, 2.0, 3.0])),
        pt_valid=state.pt_valid.at[0].set(True))
    p = str(tmp_path / "map.npz")
    checkpoint.save_map(p, state, CFG, extra={"trajectory": np.eye(4)[None]})
    state2, cfg2, extra = checkpoint.load_map(p)
    assert cfg2 == CFG
    assert int(state2.n_kfs) == 3
    np.testing.assert_allclose(np.asarray(state2.pt_pos[0]), [1, 2, 3])
    assert extra["trajectory"].shape == (1, 4, 4)


def test_remove_redundant_kfs():
    state = init_map_state(CFG)
    K = CFG.points.max_kpts
    # 5 KFs all observing the same 32 landmarks (hugely redundant)
    lm_ids = jnp.arange(32, dtype=jnp.int32)
    obs_row = jnp.full((K,), -1, jnp.int32).at[:32].set(lm_ids)
    state = state._replace(
        n_kfs=jnp.asarray(5),
        kf_valid=state.kf_valid.at[:5].set(True),
        pt_valid=state.pt_valid.at[:32].set(True),
        pt_nobs=state.pt_nobs.at[:32].set(5),
        obs_pt_lm=state.obs_pt_lm.at[:5].set(obs_row))
    state2, removed = remove_redundant_kfs(state, CFG)
    assert int(removed) == 1
    # newest (4) and first (0) kept
    assert bool(state2.kf_valid[4]) and bool(state2.kf_valid[0])
    assert int(jnp.sum(state2.kf_valid[:5])) == 4
    # detached observations decremented the counters
    assert int(state2.pt_nobs[0]) == 4


def test_remove_redundant_kfs_keeps_unique_views():
    state = init_map_state(CFG)
    K = CFG.points.max_kpts
    # each KF observes its own landmarks -> nothing redundant
    rows = []
    for i in range(4):
        rows.append(jnp.full((K,), -1, jnp.int32).at[:8].set(
            jnp.arange(8, dtype=jnp.int32) + 8 * i))
    state = state._replace(
        n_kfs=jnp.asarray(4),
        kf_valid=state.kf_valid.at[:4].set(True),
        pt_valid=state.pt_valid.at[:32].set(True),
        pt_nobs=state.pt_nobs.at[:32].set(1),
        obs_pt_lm=state.obs_pt_lm.at[:4].set(jnp.stack(rows)))
    state2, removed = remove_redundant_kfs(state, CFG)
    assert int(removed) == 0
    assert int(jnp.sum(state2.kf_valid[:4])) == 4


def test_fuse_loop_landmarks():
    from plslam_tpu.ops import hamming
    rng = np.random.default_rng(0)
    state = init_map_state(CFG)
    K = CFG.points.max_kpts
    desc = rng.integers(0, 2, (8, 256)).astype(np.uint8)
    # KF0 observes landmarks 0..7; KF1 observes duplicates 10..17 with the
    # same descriptors and (nearly) same positions
    pos = rng.uniform(-3, 3, (8, 3)).astype(np.float32)
    state = state._replace(
        n_kfs=jnp.asarray(2),
        kf_valid=state.kf_valid.at[:2].set(True),
        pt_valid=state.pt_valid.at[:8].set(True).at[10:18].set(True),
        pt_pos=state.pt_pos.at[:8].set(jnp.asarray(pos)).at[10:18].set(
            jnp.asarray(pos + 0.01)),
        pt_nobs=state.pt_nobs.at[:8].set(2).at[10:18].set(1),
        obs_pt_lm=state.obs_pt_lm
            .at[0, :8].set(jnp.arange(8, dtype=jnp.int32))
            .at[1, :8].set(jnp.arange(10, 18, dtype=jnp.int32)),
        obs_pt_disp=state.obs_pt_disp.at[:2, :8].set(5.0),
        kf_pt_desc=state.kf_pt_desc
            .at[0, :8].set(hamming.pack_bits(jnp.asarray(desc)))
            .at[1, :8].set(hamming.pack_bits(jnp.asarray(desc))))
    state2, n_fused = fuse_loop_landmarks(
        state, jnp.asarray(0), jnp.asarray(1), CFG)
    assert int(n_fused) == 8
    # duplicates invalidated, observations redirected to the keepers
    assert int(jnp.sum(state2.pt_valid[10:18])) == 0
    np.testing.assert_array_equal(np.asarray(state2.obs_pt_lm[1, :8]),
                                  np.arange(8))
    assert int(state2.pt_nobs[0]) == 3


def test_viz_renders(tmp_path):
    from plslam_tpu.utils.viz import plot_scene, draw_features
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5)
    pts = np.random.default_rng(0).uniform(-2, 2, (50, 3)).astype(np.float32)
    p = str(tmp_path / "scene.png")
    out = plot_scene(poses, pts, path=p, loop_pairs=[(0, 4)])
    assert os.path.exists(out) and os.path.getsize(out) > 5000
    img = np.zeros((40, 60), np.float32)
    over = draw_features(img)
    assert over.shape == (40, 60, 3)


def test_remove_redundant_kfs_global_sweeps_old_kfs():
    """The global sweep retires redundant KFs OUTSIDE the local window
    (the window pass never reaches them on long sequences)."""
    from plslam_tpu.backend.map import remove_redundant_kfs_global
    state = init_map_state(CFG)
    K = CFG.points.max_kpts
    lm_ids = jnp.arange(32, dtype=jnp.int32)
    obs_row = jnp.full((K,), -1, jnp.int32).at[:32].set(lm_ids)
    # 12 KFs; KFs 1-3 are far OUTSIDE the window (window 4+1 over n=12)
    # and observe the same heavily-observed landmarks
    state = state._replace(
        n_kfs=jnp.asarray(12),
        kf_valid=state.kf_valid.at[:12].set(True),
        pt_valid=state.pt_valid.at[:32].set(True),
        pt_nobs=state.pt_nobs.at[:32].set(12),
        obs_pt_lm=state.obs_pt_lm.at[:12].set(
            jnp.broadcast_to(obs_row, (12, K))))
    # the window pass cannot retire KF 1-3 (outside last window_kfs)
    state_w, _ = remove_redundant_kfs(state, CFG)
    assert bool(state_w.kf_valid[1]) and bool(state_w.kf_valid[2])
    # the global sweep can — up to max_retire per call, never 0 / newest
    state_g, removed = remove_redundant_kfs_global(state, CFG)
    assert int(removed) == 4
    assert bool(state_g.kf_valid[0]) and bool(state_g.kf_valid[11])
    assert int(jnp.sum(state_g.kf_valid[:12])) == 8
    # observation counters decremented once per retired observer
    assert int(state_g.pt_nobs[0]) == 8


def test_fuse_loop_line_landmarks():
    """Line landmarks fuse after a loop too (loopClosureFuseLandmarks
    fuses BOTH families in the reference)."""
    from plslam_tpu.ops import hamming
    rng = np.random.default_rng(1)
    state = init_map_state(CFG)
    L = CFG.lines.max_lines
    desc = rng.integers(0, 2, (L, 256)).astype(np.uint8)
    sp = rng.uniform(-3, 3, (6, 3)).astype(np.float32)
    ep = sp + rng.uniform(0.5, 1.5, (6, 3)).astype(np.float32)
    state = state._replace(
        n_kfs=jnp.asarray(2),
        kf_valid=state.kf_valid.at[:2].set(True),
        ln_valid=state.ln_valid.at[:6].set(True).at[10:16].set(True),
        ln_spos=state.ln_spos.at[:6].set(jnp.asarray(sp)).at[10:16].set(
            jnp.asarray(sp + 0.01)),
        ln_epos=state.ln_epos.at[:6].set(jnp.asarray(ep)).at[10:16].set(
            jnp.asarray(ep + 0.01)),
        ln_nobs=state.ln_nobs.at[:6].set(2).at[10:16].set(1),
        obs_ln_lm=state.obs_ln_lm
            .at[0, :6].set(jnp.arange(6, dtype=jnp.int32))
            .at[1, :6].set(jnp.arange(10, 16, dtype=jnp.int32)),
        kf_ln_desc=state.kf_ln_desc
            .at[0].set(hamming.pack_bits(jnp.asarray(desc)))
            .at[1].set(hamming.pack_bits(jnp.asarray(desc))))
    state2, n_fused = fuse_loop_landmarks(
        state, jnp.asarray(0), jnp.asarray(1), CFG)
    assert int(n_fused) == 6
    assert int(jnp.sum(state2.ln_valid[10:16])) == 0
    np.testing.assert_array_equal(np.asarray(state2.obs_ln_lm[1, :6]),
                                  np.arange(6))
    assert int(state2.ln_nobs[0]) == 3


def test_loop_verification_from_lines_only():
    """isLoopClosure parity: the geometric verification must succeed on
    LBD line matches alone (the reference BF-matches ORB AND LBD; a
    texture-poor revisit can be line-only)."""
    from plslam_tpu.loop.loop_closer import verify_loop_geometry
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.core import lie
    from plslam_tpu.ops import hamming
    from plslam_tpu.frontend.features import line_equation

    cfg = CFG.with_updates({"loop": {"lc_inl": 10},
                            "tracking": {"min_features": 8}})
    cam = StereoCamera.from_config(cfg.camera)
    rng = np.random.default_rng(2)
    K = cfg.points.max_kpts
    L = cfg.lines.max_lines

    # 3D line endpoints in KF a's camera frame
    n_ln = 14
    sP = np.stack([rng.uniform(-4, 4, n_ln), rng.uniform(-2, 2, n_ln),
                   rng.uniform(6, 18, n_ln)], -1).astype(np.float32)
    eP = sP + rng.uniform(-2, 2, (n_ln, 3)).astype(np.float32)
    eP[:, 2] = np.maximum(eP[:, 2], 4.0)
    # KF a stores raw pixel endpoints + disparities
    def proj(P):
        return np.stack([cam.fx * P[:, 0] / P[:, 2] + cam.cx,
                         cam.fy * P[:, 1] / P[:, 2] + cam.cy], -1)
    sp_a, ep_a = proj(sP), proj(eP)
    sd = np.asarray(cam.fx * cam.b) / sP[:, 2]
    ed = np.asarray(cam.fx * cam.b) / eP[:, 2]
    ends_a = np.zeros((L, 6), np.float32)
    ends_a[:n_ln] = np.concatenate(
        [sp_a, ep_a, sd[:, None], ed[:, None]], -1)

    # KF b sees the same lines from a rotated+translated pose
    T_ab = np.asarray(lie.exp_se3(jnp.asarray(
        [0.3, -0.1, 0.4, 0.02, 0.08, -0.03])), np.float32)
    sP_b = sP @ T_ab[:3, :3].T + T_ab[:3, 3]
    eP_b = eP @ T_ab[:3, :3].T + T_ab[:3, 3]
    sp_b, ep_b = proj(sP_b), proj(eP_b)
    le_b = np.asarray(line_equation(jnp.asarray(sp_b), jnp.asarray(ep_b)))
    ends_b = np.zeros((L, 6), np.float32)
    ends_b[:n_ln] = np.concatenate(
        [sp_b, ep_b,
         (np.asarray(cam.fx * cam.b) / sP_b[:, 2])[:, None],
         (np.asarray(cam.fx * cam.b) / eP_b[:, 2])[:, None]], -1)
    le_full = np.zeros((L, 3), np.float32)
    le_full[:n_ln] = le_b[:n_ln]

    desc = rng.integers(0, 2, (L, 256)).astype(np.uint8)
    ln_desc = np.asarray(hamming.pack_bits(jnp.asarray(desc)))

    # point channel empty: zero disparities invalidate every point
    pt_desc = np.zeros((K, 8), np.uint32)
    uv = np.zeros((K, 2), np.float32)
    disp = np.zeros((K,), np.float32)

    res, n_matches = verify_loop_geometry(
        jnp.asarray(pt_desc), jnp.asarray(uv), jnp.asarray(disp),
        jnp.asarray(pt_desc), jnp.asarray(uv),
        jnp.asarray(ln_desc), jnp.asarray(ends_a),
        jnp.asarray(ln_desc), jnp.asarray(ends_b),
        jnp.asarray(le_full), cam, cfg)
    assert int(n_matches) >= n_ln
    assert bool(res.good)
    # recovered relative pose matches the ground truth
    err = np.asarray(lie.log_se3(jnp.asarray(
        np.linalg.inv(T_ab) @ np.asarray(res.T))))
    assert np.linalg.norm(err[:3]) < 0.05, err
    assert np.linalg.norm(err[3:]) < 0.01, err


def test_kitti_odometry_error_metric():
    """kitti_odometry_error: exact on a synthetic straight run with a
    known relative drift."""
    from plslam_tpu.utils.evaluation import kitti_odometry_error
    n = 1500
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    gt[:, 2, 3] = np.arange(n) * 1.0          # 1 m per frame forward
    # estimate drifts 1% in translation along x
    est = gt.copy()
    est[:, 0, 3] = 0.01 * np.arange(n)
    t_pct, r_deg_m, n_seg = kitti_odometry_error(est, gt)
    assert n_seg > 100
    assert abs(t_pct - 1.0) < 0.05, t_pct
    assert r_deg_m < 1e-6
    # perfect estimate scores zero
    t0, r0, _ = kitti_odometry_error(gt, gt)
    assert t0 < 1e-9 and r0 < 1e-9
