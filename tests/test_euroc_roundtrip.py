"""End-to-end EuRoC-ASL reader certification (VERDICT round-1 weak item:
the EuRoC path's rectification and GT frame-change math had only been
property-tested in pieces, never driven through a real directory).

A synthetic scene is rendered through a RAW EuRoC-style rig — two
pinhole cameras with different intrinsics and a small relative rotation
on top of the baseline, plus a non-trivial body-to-camera extrinsic —
and written to disk in the exact ASL layout (mav0/cam{0,1}/data/<ns>.png,
sensor.yaml with T_BS, state_groundtruth_estimate0/data.csv with T_WB
quaternions). The reader must rectify the pair and re-express the GT in
the rectified-left frame such that stereo VO on the rectified stream
matches that GT. Quaternion conventions and T_BS composition are the
classic silent-failure territory this covers."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig, CameraConfig
from plslam_tpu.io import synthetic
from plslam_tpu.io.dataset import open_dataset
from plslam_tpu.utils.evaluation import ate_rmse

H, W = 320, 480
K0 = np.array([[300.0, 0, 240.0], [0, 296.0, 160.0], [0, 0, 1.0]])
K1 = np.array([[305.0, 0, 238.0], [0, 301.0, 162.0], [0, 0, 1.0]])
BASELINE = 0.2


def _rot(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


# raw rig: cam1 = baseline shift + ~1.7 deg of rotational misalignment
R_10 = _rot(0.01, -0.02, 0.015)              # x_c1 = R_10 x_c0 + t_10
T_10 = np.eye(4)
T_10[:3, :3] = R_10
T_10[:3, 3] = R_10 @ np.array([-BASELINE, 0.0, 0.0])
# body frame: cam0 rotated/offset (exercises the T_BS composition)
T_BS0 = np.eye(4)
T_BS0[:3, :3] = _rot(0.1, 0.2, -0.15)
T_BS0[:3, 3] = [0.05, -0.02, 0.1]


def _rot_to_quat(R):
    w = np.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 0)) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return w, x, y, z


def _render_cam(world, T_wc, K):
    """Left image of render_frame at pose T_wc with pinhole K."""
    class _Cam:
        fx, fy = float(K[0, 0]), float(K[1, 1])
        cx, cy = float(K[0, 2]), float(K[1, 2])
        b = 0.0
        height, width = H, W
    rng = np.random.default_rng(0)
    img_l, _ = synthetic.render_frame(world, T_wc, _Cam, rng, noise=0.004)
    return img_l


def _write_euroc(tmp, seq_world, poses_wc0):
    from PIL import Image
    mav = os.path.join(tmp, "mav0")
    for cam, K, T_rel in (("cam0", K0, np.eye(4)),
                          ("cam1", K1, T_10)):
        os.makedirs(os.path.join(mav, cam, "data"), exist_ok=True)
        # sensor.yaml: T_BS maps camera coords to body coords
        T_BS = T_BS0 @ np.linalg.inv(T_rel)
        y = {
            "intrinsics": [float(K[0, 0]), float(K[1, 1]),
                           float(K[0, 2]), float(K[1, 2])],
            "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
            "resolution": [W, H],
            "T_BS": {"data": [float(v) for v in T_BS.reshape(-1)]},
        }
        import yaml
        with open(os.path.join(mav, cam, "sensor.yaml"), "w") as f:
            yaml.safe_dump(y, f)
    gt_dir = os.path.join(mav, "state_groundtruth_estimate0")
    os.makedirs(gt_dir, exist_ok=True)
    rows = ["#timestamp,px,py,pz,qw,qx,qy,qz"]
    for i, T_wc0 in enumerate(poses_wc0):
        ns = 1000000000 + i * 50000000
        for cam, K, T_rel in (("cam0", K0, np.eye(4)),
                              ("cam1", K1, T_10)):
            # camera pose of this eye: T_w_cam = T_wc0 @ inv(T_rel)
            T_w_cam = T_wc0 @ np.linalg.inv(T_rel)
            img = _render_cam(seq_world, T_w_cam, K)
            u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(u8, mode="L").save(
                os.path.join(mav, cam, "data", f"{ns}.png"))
        T_WB = T_wc0 @ np.linalg.inv(T_BS0)
        q = _rot_to_quat(T_WB[:3, :3])
        p = T_WB[:3, 3]
        rows.append(f"{ns},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]}")
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.mark.slow
def test_euroc_layout_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    world = synthetic.make_world(rng, n_points=260, n_lines=0,
                                 depth=(3.0, 14.0), extent=7.0)
    poses = synthetic.make_trajectory(8, kind="forward", step=0.18, rng=rng)
    _write_euroc(str(tmp_path), world, poses)

    ds = open_dataset(str(tmp_path))
    assert len(ds) == 8 and ds.gt_poses is not None
    assert ds.rect_maps is not None
    cam_cfg = ds.camera
    # rectified intrinsics are sane
    assert 250 < cam_cfg.fx < 360 and abs(cam_cfg.baseline - BASELINE) < 0.01

    # VO on the rectified stream must match the re-expressed GT
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.tracking.frame_handler import StereoVO
    from plslam_tpu.frontend.stereo_frame import make_extractor
    cfg = SlamConfig().with_updates({
        "camera": {k: getattr(cam_cfg, k) for k in
                   ("width", "height", "fx", "fy", "cx", "cy", "baseline")},
        "points": {"max_kpts": 384, "orb_nlevels": 2},
        "lines": {"has_lines": False},
        "matching": {"f2f_window": 96.0}})
    cam = StereoCamera.from_config(cfg.camera)
    vo = StereoVO(cfg, cam, extract_fn=make_extractor(cam, cfg))
    il, ir = ds.frame(0)
    vo.initialize(il, ir)
    est = [vo.T_wc.copy()]
    for i in range(1, len(ds)):
        il, ir = ds.frame(i)
        fr = vo.insert_stereo_pair(il, ir)
        assert fr.good, f"tracking failed at frame {i}"
        est.append(fr.T_wc)
    ds.close()
    a = ate_rmse(np.stack(est), ds.gt_poses)
    assert a < 0.05, f"EuRoC round-trip ATE {a:.3f} m"
