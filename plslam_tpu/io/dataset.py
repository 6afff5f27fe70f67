"""Dataset readers.

Reference parity: stvo-pl ``src/dataset.cpp`` + ``dataset_params.yaml``
— enumerates rectified stereo image pairs and carries the calibration.
Supports:
  * KITTI odometry layout   (<dir>/image_0/*.png, <dir>/image_1/*.png)
  * EuRoC ASL layout        (<dir>/mav0/cam0/data/*.png, cam1/...)
  * generic params yaml     (<dir>/dataset_params.yaml with
                             images_subfolder_l/r + calibration keys,
                             the reference's scheme)
  * synthetic://            (in-memory ground-truth scenes; this machine
                             has no datasets and no network)

Images decode through the C++ native loader when built (see
plslam_tpu/native), else PIL. Output is (H, W) float32 in [0, 1].
"""

from __future__ import annotations

import os
import glob
from typing import Iterator, List, Optional, Tuple

import numpy as np

from plslam_tpu.config import CameraConfig, SlamConfig


def _load_gray(path: str) -> np.ndarray:
    from plslam_tpu.native import imageio as native_io
    img = native_io.load_gray(path)
    if img is not None:
        return img
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.float32) / 255.0


class StereoDataset:
    """Iterates (img_l, img_r) float32 pairs + optional GT poses."""

    def __init__(self, left: List[str], right: List[str],
                 camera: CameraConfig, gt_poses: Optional[np.ndarray] = None,
                 name: str = "dataset"):
        assert len(left) == len(right), "stereo list length mismatch"
        self.left = left
        self.right = right
        self.camera = camera
        self.gt_poses = gt_poses
        self.name = name

    def __len__(self) -> int:
        return len(self.left)

    def frame(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return _load_gray(self.left[i]), _load_gray(self.right[i])

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for i in range(len(self)):
            yield self.frame(i)


def _sorted_images(d: str) -> List[str]:
    out: List[str] = []
    for ext in ("png", "jpg", "jpeg", "pgm", "ppm", "bmp"):
        out.extend(glob.glob(os.path.join(d, f"*.{ext}")))
    return sorted(out)


def open_dataset(path: str, camera: Optional[CameraConfig] = None,
                 start: int = 0, count: Optional[int] = None, step: int = 1
                 ) -> StereoDataset:
    """Detect the layout and build a StereoDataset (Dataset::Dataset parity,
    including the frame offset/count/step CLI arguments)."""
    if os.path.isdir(os.path.join(path, "image_0")):
        l = _sorted_images(os.path.join(path, "image_0"))
        r = _sorted_images(os.path.join(path, "image_1"))
        name = "kitti:" + os.path.basename(os.path.normpath(path))
        gt = _load_kitti_poses(path)
    elif os.path.isdir(os.path.join(path, "mav0")):
        l = _sorted_images(os.path.join(path, "mav0", "cam0", "data"))
        r = _sorted_images(os.path.join(path, "mav0", "cam1", "data"))
        name = "euroc:" + os.path.basename(os.path.normpath(path))
        gt = None
    elif os.path.exists(os.path.join(path, "dataset_params.yaml")):
        import yaml
        with open(os.path.join(path, "dataset_params.yaml")) as f:
            p = yaml.safe_load(f)
        l = _sorted_images(os.path.join(path, p.get("images_subfolder_l", "left")))
        r = _sorted_images(os.path.join(path, p.get("images_subfolder_r", "right")))
        camera = camera or CameraConfig(
            width=int(p.get("cam_width", 1241)), height=int(p.get("cam_height", 376)),
            fx=float(p.get("cam_fx", 718.856)), fy=float(p.get("cam_fy", 718.856)),
            cx=float(p.get("cam_cx", 607.19)), cy=float(p.get("cam_cy", 185.22)),
            baseline=float(p.get("cam_bl", 0.537)))
        name = "params:" + os.path.basename(os.path.normpath(path))
        gt = None
    else:
        raise FileNotFoundError(f"no recognizable stereo dataset at {path}")
    end = None if count is None else start + count * step
    sl = slice(start, end, step)
    gt_sl = gt[sl] if gt is not None else None
    return StereoDataset(l[sl], r[sl], camera or CameraConfig(), gt_sl, name)


def _load_kitti_poses(path: str) -> Optional[np.ndarray]:
    """KITTI poses.txt (3x4 row-major per line) if present."""
    for cand in (os.path.join(path, "poses.txt"),
                 os.path.join(path, "..", "poses",
                              os.path.basename(os.path.normpath(path)) + ".txt")):
        if os.path.exists(cand):
            rows = np.loadtxt(cand).reshape(-1, 3, 4)
            poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
            poses[:, :3, :] = rows
            return poses
    return None


def synthetic_dataset(cfg: SlamConfig, n_frames: int = 50, seed: int = 0,
                      kind: str = "forward", n_points: int = 300,
                      n_lines: int = 60, step: float = 0.15,
                      noise: float = 0.005):
    """In-memory synthetic stereo dataset with exact GT poses."""
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic as synth

    cam = StereoCamera.from_config(cfg.camera)
    seq = synth.make_sequence(cam, n_frames=n_frames, seed=seed, kind=kind,
                              n_points=n_points, n_lines=n_lines, step=step,
                              noise=noise)

    class _MemDataset(StereoDataset):
        def __init__(self):
            self.left = [str(i) for i in range(n_frames)]
            self.right = list(self.left)
            self.camera = cfg.camera
            self.gt_poses = seq.poses
            self.name = f"synthetic:{kind}"
            self.seq = seq

        def frame(self, i: int):
            return seq.images_l[i], seq.images_r[i]

    return _MemDataset()
