"""Dataset reader tests: layouts, EuRoC raw->rectified path, GT loading."""

import os

import numpy as np
import pytest

from plslam_tpu.io.dataset import open_dataset


def _write_png(path, img):
    from PIL import Image
    Image.fromarray((img * 255).astype(np.uint8)).save(path)


def _make_kitti(root, n=3, w=64, h=48):
    rng = np.random.default_rng(0)
    for cam in ("image_0", "image_1"):
        os.makedirs(os.path.join(root, cam))
        for i in range(n):
            _write_png(os.path.join(root, cam, f"{i:06d}.png"),
                       rng.uniform(0, 1, (h, w)))
    poses = np.hstack([np.tile(np.eye(3, 4).reshape(-1), (n, 1))])
    np.savetxt(os.path.join(root, "poses.txt"), poses)


def test_kitti_layout(tmp_path):
    root = str(tmp_path / "seq00")
    _make_kitti(root)
    ds = open_dataset(root)
    assert len(ds) == 3
    assert ds.rect_maps is None
    il, ir = ds.frame(0)
    assert il.shape == (48, 64) and il.dtype == np.float32
    assert ds.gt_poses is not None and ds.gt_poses.shape == (3, 4, 4)


EUROC_CAM0 = """\
sensor_type: camera
T_BS:
  rows: 4
  cols: 4
  data: [1.0, 0.0, 0.0, 0.01,
         0.0, 1.0, 0.0, 0.02,
         0.0, 0.0, 1.0, 0.03,
         0.0, 0.0, 0.0, 1.0]
resolution: [64, 48]
camera_model: pinhole
intrinsics: [100.0, 99.0, 32.0, 24.0]
distortion_model: radial-tangential
distortion_coefficients: [-0.05, 0.01, 0.0001, 0.0001]
"""

EUROC_CAM1 = """\
sensor_type: camera
T_BS:
  rows: 4
  cols: 4
  data: [1.0, 0.0, 0.0, 0.12,
         0.0, 1.0, 0.0, 0.02,
         0.0, 0.0, 1.0, 0.03,
         0.0, 0.0, 0.0, 1.0]
resolution: [64, 48]
camera_model: pinhole
intrinsics: [101.0, 100.0, 31.0, 25.0]
distortion_model: radial-tangential
distortion_coefficients: [-0.05, 0.01, 0.0001, 0.0001]
"""


def _make_euroc(root, n=3, w=64, h=48):
    rng = np.random.default_rng(1)
    stamps = [1403636579763555584 + i * 50000000 for i in range(n)]
    for cam, yml in (("cam0", EUROC_CAM0), ("cam1", EUROC_CAM1)):
        d = os.path.join(root, "mav0", cam, "data")
        os.makedirs(d)
        with open(os.path.join(root, "mav0", cam, "sensor.yaml"), "w") as f:
            f.write(yml)
        for s in stamps:
            _write_png(os.path.join(d, f"{s}.png"), rng.uniform(0, 1, (h, w)))
    gdir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    os.makedirs(gdir)
    with open(os.path.join(gdir, "data.csv"), "w") as f:
        f.write("#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z\n")
        for i, s in enumerate(stamps):
            f.write(f"{s},{0.1 * i},{0.0},{0.0},1.0,0.0,0.0,0.0\n")
    return stamps


def test_euroc_raw_rectified(tmp_path):
    root = str(tmp_path / "MH_01")
    _make_euroc(root)
    ds = open_dataset(root)
    assert len(ds) == 3
    # raw rig -> rectify maps attached, rectified intrinsics (fx == fy,
    # baseline = |T_BS1 - T_BS0| translation)
    assert ds.rect_maps is not None
    assert ds.camera.fx == ds.camera.fy
    np.testing.assert_allclose(ds.camera.baseline, 0.11, atol=1e-9)
    il, ir = ds.frame(0)
    il = np.asarray(il)
    assert il.shape == (48, 64)
    assert np.isfinite(il).all() and il.max() <= 1.0 + 1e-6
    # GT present, camera-frame, translation increments match the csv
    assert ds.gt_poses is not None and ds.gt_poses.shape == (3, 4, 4)
    step = ds.gt_poses[1][:3, 3] - ds.gt_poses[0][:3, 3]
    np.testing.assert_allclose(np.linalg.norm(step), 0.1, atol=1e-5)


def test_euroc_frame_range(tmp_path):
    root = str(tmp_path / "MH_02")
    _make_euroc(root, n=6)
    ds = open_dataset(root, start=1, count=2, step=2)
    assert len(ds) == 2
    assert ds.gt_poses.shape == (2, 4, 4)


def test_native_remap_matches_numpy(tmp_path):
    """The C++ prefetch-pool remap must agree with the numpy fallback
    (and hence with the device remap it replaced)."""
    from plslam_tpu.native import imageio as nio
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    m = np.stack(np.meshgrid(np.arange(64, dtype=np.float32) * 0.93 + 1.7,
                             np.arange(48, dtype=np.float32) * 1.05 - 0.4),
                 axis=-1)
    want = nio._remap_np(img, m)
    got = nio.remap(img, m)
    if got is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_euroc_rectified_prefetch_matches_fallback(tmp_path):
    """Frames served by the rectifying prefetch pool must equal decode +
    numpy remap of the same source image."""
    from plslam_tpu.native import imageio as nio
    from plslam_tpu.io.dataset import _load_gray
    root = str(tmp_path / "MH_03")
    _make_euroc(root)
    ds = open_dataset(root)
    il, _ = ds.frame(1)
    raw = _load_gray(ds.left[1])
    want = nio._remap_np(raw, ds.rect_maps[0])
    np.testing.assert_allclose(il, want, atol=1e-5)
    ds.close()
