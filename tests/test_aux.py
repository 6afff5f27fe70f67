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
