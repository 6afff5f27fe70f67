"""Point front-end tests on synthetic imagery with exact ground truth.

The reference has no unit tests; these validate our FAST/ORB/stereo
matcher against scenes where the true feature geometry is known.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.stereo_points import (
    extract_stereo_points, detect_and_describe)
from plslam_tpu.io import synthetic
from plslam_tpu.ops import fast, hamming


CFG = SlamConfig().with_updates({
    "camera": {"width": 640, "height": 384, "fx": 450.0, "fy": 450.0,
               "cx": 320.0, "cy": 192.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 2},
})
CAM = StereoCamera.from_config(CFG.camera)


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(CAM, n_frames=2, seed=3, n_points=120,
                                   n_lines=0, noise=0.0)


def test_fast_fires_on_corners():
    img = jnp.zeros((128, 128))
    # a bright 10x10 square has 4 strong corners
    img = img.at[40:50, 60:70].set(1.0)
    uv, score, valid = fast.detect_fast(
        img, 64, th=0.1, th_min=0.05, adaptive=False, nms_radius=4,
        grid_rows=4, grid_cols=4, border=8)
    got = np.asarray(uv[np.asarray(valid)])
    corners = np.array([[60, 40], [69, 40], [60, 49], [69, 49]])
    for c in corners:
        d = np.min(np.linalg.norm(got - c, axis=1)) if len(got) else 1e9
        assert d <= 2.5, f"corner {c} missed (nearest {d:.1f} px)"


def test_detect_recall_on_synthetic(seq):
    img = jnp.asarray(seq.images_l[0])
    uv, desc, octv, ang, score, valid = detect_and_describe(img, CFG)
    got = np.asarray(uv[np.asarray(valid)])
    gt = synthetic.exact_stereo_features(seq.world, seq.poses[0], CAM)
    vis_pts = gt["uv_l"][gt["vis"]]
    # detections land on texture corners of the stamped patch, which lie
    # within the patch half-size (10 px) of the GT center; 5 px covers the
    # inner block corners
    hit = 0
    for p in vis_pts:
        if len(got) and np.min(np.linalg.norm(got - p, axis=1)) < 5.0:
            hit += 1
    recall = hit / max(len(vis_pts), 1)
    assert recall > 0.6, f"detector recall too low: {recall:.2f} ({len(vis_pts)} gt)"


def test_descriptor_discriminative(seq):
    """Same physical point in both eyes -> small Hamming distance;
    different points -> large."""
    obs = extract_stereo_points(jnp.asarray(seq.images_l[0]),
                                jnp.asarray(seq.images_r[0]), CAM, CFG)
    valid = np.asarray(obs.valid)
    assert valid.sum() >= 30, f"too few stereo matches: {valid.sum()}"


def test_stereo_disparity_accuracy(seq):
    obs = extract_stereo_points(jnp.asarray(seq.images_l[0]),
                                jnp.asarray(seq.images_r[0]), CAM, CFG)
    gt = synthetic.exact_stereo_features(seq.world, seq.poses[0], CAM)
    uv = np.asarray(obs.uv)
    disp = np.asarray(obs.disp)
    valid = np.asarray(obs.valid)
    # for each valid match near a GT point, disparity must agree
    errs = []
    for i in np.nonzero(valid)[0]:
        d = np.linalg.norm(gt["uv_l"][gt["vis"]] - uv[i], axis=1)
        j = np.argmin(d)
        if d[j] < 6.0:  # texture corners lie within the stamped patch
            errs.append(abs(gt["disp"][gt["vis"]][j] - disp[i]))
    assert len(errs) >= 20, f"too few matched-to-GT points: {len(errs)}"
    errs = np.array(errs)
    assert np.median(errs) < 1.0, f"median disparity err {np.median(errs):.2f}"
    # and 3D back-projection consistency
    P = np.asarray(obs.P)[valid]
    assert np.all(P[:, 2] > 0.5) and np.all(P[:, 2] < 100.0)


def test_matching_ratio_and_mutual():
    """match_nnr drops ambiguous matches (two near-identical candidates)."""
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (4, 256)).astype(np.uint8)
    b = np.concatenate([a[:3], a[2:3]], axis=0)  # b[3] duplicates b[2]
    # flip a few bits so nothing is exactly 0 distance
    b = b ^ (rng.integers(0, 2, b.shape) * (rng.random(b.shape) < 0.02)).astype(np.uint8)
    dist = hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
    res = hamming.match_nnr(dist, max_dist=80.0, ratio=0.75, mutual=True)
    idx = np.asarray(res.idx)
    assert idx[0] == 0 and idx[1] == 1
    assert idx[2] == -1  # ambiguous between b[2], b[3] -> ratio test kills it
    np.testing.assert_array_equal(np.asarray(res.valid), idx >= 0)


def test_hamming_matmul_exact():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2, (64, 256)).astype(np.uint8)
    b = rng.integers(0, 2, (48, 256)).astype(np.uint8)
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    got = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got.astype(int), ref)
    # bf16 path must be exact too (products are +-1, f32 accumulate)
    got16 = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b),
                                              bf16=True))
    np.testing.assert_array_equal(got16.astype(int), ref)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, (10, 256)).astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(hamming.unpack_bits(hamming.pack_bits(bits))),
        np.asarray(bits))
