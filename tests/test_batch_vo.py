"""Chunked VO must agree with the per-frame driver."""

import numpy as np
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.tracking.frame_handler import StereoVO
from plslam_tpu.tracking.batch_vo import BatchedStereoVO
from plslam_tpu.utils.evaluation import ate_rmse

CFG = SlamConfig().with_updates({
    "camera": {"width": 640, "height": 384, "fx": 450.0, "fy": 450.0,
               "cx": 320.0, "cy": 192.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 2},
    "lines": {"has_lines": False},
})
CAM = StereoCamera.from_config(CFG.camera)


def test_chunked_matches_per_frame():
    seq = synthetic.make_sequence(CAM, n_frames=9, seed=7, n_points=260,
                                  n_lines=0, noise=0.003, step=0.12)
    vo = StereoVO(CFG, CAM)
    vo.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, 9):
        vo.insert_stereo_pair(seq.images_l[i], seq.images_r[i])
    est_frame = np.stack(vo.trajectory)

    bvo = BatchedStereoVO(CFG, CAM)
    bvo.initialize(seq.images_l[0], seq.images_r[0])
    out = bvo.process_chunk(seq.images_l[1:5], seq.images_r[1:5])
    assert np.asarray(out.good).all()
    bvo.process_chunk(seq.images_l[5:9], seq.images_r[5:9])
    est_chunk = np.stack(bvo.trajectory)

    assert est_chunk.shape == est_frame.shape
    a_frame = ate_rmse(est_frame, seq.poses)
    a_chunk = ate_rmse(est_chunk, seq.poses)
    assert a_chunk < 0.05, a_chunk
    # same solver, same matches -> trajectories agree tightly
    d = np.linalg.norm(est_chunk[:, :3, 3] - est_frame[:, :3, 3], axis=1)
    assert d.max() < 5e-3, d.max()


def test_pipelined_matches_sync():
    """submit_chunk/drain (two chunks in flight) must produce the same
    trajectory as synchronous process_chunk."""
    seq = synthetic.make_sequence(CAM, n_frames=9, seed=11, n_points=260,
                                  n_lines=0, noise=0.003, step=0.12)
    sync = BatchedStereoVO(CFG, CAM)
    sync.initialize(seq.images_l[0], seq.images_r[0])
    sync.process_chunk(seq.images_l[1:5], seq.images_r[1:5])
    sync.process_chunk(seq.images_l[5:9], seq.images_r[5:9])

    pipe = BatchedStereoVO(CFG, CAM)
    pipe.initialize(seq.images_l[0], seq.images_r[0])
    pipe.submit_chunk(seq.images_l[1:5], seq.images_r[1:5])
    pipe.submit_chunk(seq.images_l[5:9], seq.images_r[5:9])
    assert len(pipe._pending) == 2
    pipe.drain()
    assert not pipe._pending

    a = np.stack(sync.trajectory)
    b = np.stack(pipe.trajectory)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_uint8_transport_matches_f32():
    """uint8 chunk upload (4x less host->device traffic) must track the
    same trajectory as f32 input of the same quantized images."""
    seq = synthetic.make_sequence(CAM, n_frames=5, seed=5, n_points=260,
                                  n_lines=0, noise=0.003, step=0.12)
    u8_l = np.clip(seq.images_l * 255.0 + 0.5, 0, 255).astype(np.uint8)
    u8_r = np.clip(seq.images_r * 255.0 + 0.5, 0, 255).astype(np.uint8)

    a = BatchedStereoVO(CFG, CAM)
    a.initialize(u8_l[0].astype(np.float32) / 255.0,
                 u8_r[0].astype(np.float32) / 255.0)
    a.process_chunk(u8_l[1:5], u8_r[1:5])

    b = BatchedStereoVO(CFG, CAM)
    b.initialize(u8_l[0].astype(np.float32) / 255.0,
                 u8_r[0].astype(np.float32) / 255.0)
    b.process_chunk(u8_l[1:5].astype(np.float32) / 255.0,
                    u8_r[1:5].astype(np.float32) / 255.0)

    np.testing.assert_allclose(np.stack(a.trajectory),
                               np.stack(b.trajectory), atol=1e-5)


def test_chunked_point_line_matches_per_frame():
    """The flagship configuration (points + lines) through the chunked
    path must agree with the per-frame driver."""
    from plslam_tpu.frontend.stereo_frame import make_extractor

    cfg = CFG.with_updates({"lines": {"has_lines": True, "max_lines": 64}})
    seq = synthetic.make_sequence(CAM, n_frames=7, seed=3, n_points=220,
                                  n_lines=40, noise=0.003, step=0.12)
    vo = StereoVO(cfg, CAM, extract_fn=make_extractor(CAM, cfg))
    vo.initialize(seq.images_l[0], seq.images_r[0])
    for i in range(1, 7):
        vo.insert_stereo_pair(seq.images_l[i], seq.images_r[i])
    est_frame = np.stack(vo.trajectory)

    bvo = BatchedStereoVO(cfg, CAM)
    bvo.initialize(seq.images_l[0], seq.images_r[0])
    out = bvo.process_chunk(seq.images_l[1:7], seq.images_r[1:7])
    assert np.asarray(out.good).all()
    assert bvo.prev_lns is not None           # line state threads through
    est_chunk = np.stack(bvo.trajectory)

    assert ate_rmse(est_chunk, seq.poses) < 0.05
    d = np.linalg.norm(est_chunk[:, :3, 3] - est_frame[:, :3, 3], axis=1)
    assert d.max() < 5e-3, d.max()
