"""Checkpoint/resume on the deployment (fused) driver.

Reference bar: the reference has NO persistence (SURVEY.md §5) — this
is a capability the TPU build adds: run N chunks, checkpoint, resume in
a fresh driver, finish, and match the uninterrupted run (the tracker
carry, map state, loop graph and BoW database all survive the round
trip; BoW matrices are rebuilt deterministically from the per-KF
descriptors stored in MapState).
"""

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.backend.fused_slam import FusedPLSLAM
from plslam_tpu.utils.evaluation import ate_rmse


CFG = SlamConfig().with_updates({
    "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
               "cx": 256.0, "cy": 160.0, "baseline": 0.3},
    "points": {"max_kpts": 384, "orb_nlevels": 2},
    "lines": {"max_lines": 48},
    "matching": {"f2f_window": 128.0},
    "mapping": {"max_kfs": 64, "max_points": 4096, "max_lines": 256,
                "window_kfs": 4, "fixed_kfs": 2, "lba_iters": 5},
    "keyframe": {"min_entropy_ratio": 2.0},       # KF every frame
    "loop": {"enabled": True, "min_kf_separation": 12,
             "consistency_window": 2, "lc_inl": 15,
             "lc_trs": 3.0, "lc_rot": 60.0},
    "system": {"kf_batch": 6},
})


def test_checkpoint_resume_roundtrip(tmp_path):
    cam = StereoCamera.from_config(CFG.camera)
    chunk, n = 10, 41
    seq = synthetic.make_sequence(cam, n_frames=n, seed=21, kind="loop",
                                  n_points=700, n_lines=40, noise=0.004,
                                  step=0.35)
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il, ir = u8(np.asarray(seq.images_l)), u8(np.asarray(seq.images_r))

    # uninterrupted reference run
    ref = FusedPLSLAM(CFG, cam)
    ref.initialize(il[0], ir[0])
    for lo in range(1, n, chunk):
        ref.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
    est_ref = ref.finish()
    loops_ref = ref.loop_closer.n_loops_closed
    kfs_ref = ref._kf_slot + 1
    ref.close()

    # interrupted: half the chunks, checkpoint, resume, finish
    path = str(tmp_path / "ckpt.npz")
    a = FusedPLSLAM(CFG, cam)
    a.initialize(il[0], ir[0])
    for lo in range(1, 21, chunk):
        a.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
    a.save_checkpoint(path)
    a.close()

    b = FusedPLSLAM.resume(path, cam)
    assert len(b.trajectory) == 21
    assert b._kf_slot == a._kf_slot
    # resumed loop database must equal a deterministic rebuild: the BoW
    # rows of the inserted KFs are nonzero and L1-normalized
    bp = np.asarray(jax.device_get(b.loop_closer.db.bows_p))
    nk = int(jax.device_get(b.state.n_kfs))
    row_sums = np.abs(bp[:nk]).sum(axis=1)
    assert (row_sums > 0.9).all(), row_sums
    for lo in range(21, n, chunk):
        b.process_chunk(il[lo:lo + chunk], ir[lo:lo + chunk])
    est_b = b.finish()

    assert b._kf_slot + 1 == kfs_ref
    assert b.loop_closer.n_loops_closed == loops_ref
    assert len(est_b) == len(est_ref)
    a_ref = float(ate_rmse(est_ref, seq.poses[:len(est_ref)]))
    a_res = float(ate_rmse(est_b, seq.poses[:len(est_b)]))
    # identical inputs + exactly restored state -> identical programs;
    # allow only float-accumulation noise
    assert abs(a_res - a_ref) < 5e-3, (a_ref, a_res)
    d = np.linalg.norm(est_b[-1][:3, 3] - est_ref[-1][:3, 3])
    assert d < 0.02, d
    b.close()
