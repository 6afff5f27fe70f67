"""Pinhole stereo camera model.

Reference parity: stvo-pl ``src/pinholeStereoCamera.cpp`` —
``projection``, ``backProjection``, ``rectifyImagesLR`` and the
disparity/depth relations. Rebuilt as a small NamedTuple of jnp scalars
(so it traces into jitted programs without recompilation per value) plus
host-side numpy precomputation of undistort-rectify maps, applied on
device as a bilinear gather.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class StereoCamera(NamedTuple):
    """Rectified pinhole stereo rig. All fields are scalars (jnp or py)."""
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    b: jnp.ndarray          # baseline, meters
    width: int              # static
    height: int             # static

    @staticmethod
    def from_config(cam_cfg) -> "StereoCamera":
        f32 = np.float32
        return StereoCamera(
            fx=jnp.asarray(f32(cam_cfg.fx)), fy=jnp.asarray(f32(cam_cfg.fy)),
            cx=jnp.asarray(f32(cam_cfg.cx)), cy=jnp.asarray(f32(cam_cfg.cy)),
            b=jnp.asarray(f32(cam_cfg.baseline)),
            width=int(cam_cfg.width), height=int(cam_cfg.height))

    # -- projection ----------------------------------------------------------
    def project(self, P: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) camera-frame points -> (..., 2) left-image pixels.

        pinholeStereoCamera.cpp::projection. Depth is guarded so the op
        is total; callers mask invalid depths.
        """
        z = jnp.where(jnp.abs(P[..., 2]) < 1e-7, 1e-7, P[..., 2])
        u = self.fx * P[..., 0] / z + self.cx
        v = self.fy * P[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1)

    def project_stereo(self, P: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> ((..., 2) left pixel, (...,) disparity)."""
        uv = self.project(P)
        z = jnp.where(jnp.abs(P[..., 2]) < 1e-7, 1e-7, P[..., 2])
        disp = self.fx * self.b / z
        return uv, disp

    def back_project(self, uv: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) left pixels + (...,) disparity -> (..., 3) 3D points.

        pinholeStereoCamera.cpp::backProjection (stereo variant):
        z = fx*b/d, x = (u-cx) z / fx, y = (v-cy) z / fy.
        """
        d = jnp.where(jnp.abs(disp) < 1e-7, 1e-7, disp)
        z = self.fx * self.b / d
        x = (uv[..., 0] - self.cx) * z / self.fx
        y = (uv[..., 1] - self.cy) * z / self.fy
        return jnp.stack([x, y, z], axis=-1)

    def project_jacobian(self, P: jnp.ndarray) -> jnp.ndarray:
        """d(pixel)/d(camera point): (..., 2, 3).

        [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]] — the projection block
        of the chain rule used throughout stereoFrameHandler.cpp's GN.
        """
        x, y = P[..., 0], P[..., 1]
        z = jnp.where(jnp.abs(P[..., 2]) < 1e-7, 1e-7, P[..., 2])
        iz = 1.0 / z
        iz2 = iz * iz
        zz = jnp.zeros_like(x)
        row0 = jnp.stack([self.fx * iz, zz, -self.fx * x * iz2], axis=-1)
        row1 = jnp.stack([zz, self.fy * iz, -self.fy * y * iz2], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    def in_image(self, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
        return ((uv[..., 0] >= margin) & (uv[..., 0] < self.width - margin)
                & (uv[..., 1] >= margin) & (uv[..., 1] < self.height - margin))


# -- rectification (host precompute + device gather) -------------------------

def radtan_distort(xn: np.ndarray, d: Tuple[float, ...]) -> np.ndarray:
    """Apply radial-tangential distortion to normalized coords (N, 2)."""
    k1, k2, p1, p2, k3 = (list(d) + [0.0] * 5)[:5]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def build_rectify_map(K_new: np.ndarray, K_orig: np.ndarray, d: Tuple[float, ...],
                      R_rect: np.ndarray, height: int, width: int) -> np.ndarray:
    """Host-side undistort-rectify map (cv::initUndistortRectifyMap parity).

    Returns (H, W, 2) float32 source pixel coordinates (u, v) in the raw
    image for every rectified output pixel.
    """
    vs, us = np.mgrid[0:height, 0:width].astype(np.float64)
    xn = (us - K_new[0, 2]) / K_new[0, 0]
    yn = (vs - K_new[1, 2]) / K_new[1, 1]
    pts = np.stack([xn, yn, np.ones_like(xn)], axis=-1) @ R_rect  # R^T applied
    pts = pts[..., :2] / pts[..., 2:3]
    dist = radtan_distort(pts, d)
    u_src = K_orig[0, 0] * dist[..., 0] + K_orig[0, 2]
    v_src = K_orig[1, 1] * dist[..., 1] + K_orig[1, 2]
    return np.stack([u_src, v_src], axis=-1).astype(np.float32)


def _rot_sqrt(R: np.ndarray) -> np.ndarray:
    """Principal square root of a rotation matrix (half the rotation)."""
    # axis-angle via log
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-12:
        return np.eye(3)
    w = (1.0 / (2.0 * np.sin(theta))) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    half = 0.5 * theta
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    return (np.eye(3) + np.sin(half) * K
            + (1 - np.cos(half)) * (K @ K)).astype(np.float64)


def stereo_rectify(K0: np.ndarray, d0: Tuple[float, ...],
                   K1: np.ndarray, d1: Tuple[float, ...],
                   R: np.ndarray, t: np.ndarray,
                   height: int, width: int
                   ) -> Tuple[np.ndarray, np.ndarray, "CameraConfigLike"]:
    """Full stereo rectification for a raw (distorted, unaligned) rig.

    cv::stereoRectify + initUndistortRectifyMap parity as used by
    pinholeStereoCamera.cpp::rectifyImagesLR for EuRoC-style input.
    ``R, t`` map left-camera coords to right-camera coords:
    ``x_r = R x_l + t``. Returns ``(map_l, map_r, cam_cfg)`` — two
    (H, W, 2) gather maps for :func:`remap_bilinear` plus the rectified
    :class:`~plslam_tpu.config.CameraConfig` (fx=fy, zero distortion,
    baseline |t|).

    Geometry: split R in half so both cameras rotate equally
    (``R1 = Rw R**0.5`` on the left, ``R2 = Rw R**-0.5`` on the right),
    then a common rotation Rw takes the halved baseline to the -x axis,
    so rectified frames satisfy ``x_r' = x_l' - [b, 0, 0]`` — the
    row-aligned convention every matcher/triangulator here assumes.
    """
    from plslam_tpu.config import CameraConfig
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64).reshape(3)
    Rh = _rot_sqrt(R)                    # R ** 0.5
    t_mid = Rh.T @ t                     # baseline seen from the mid frame
    b = float(np.linalg.norm(t))
    # common rotation: e1 along -t_mid (so t' = [-b, 0, 0]), e2 ⊥ in the
    # plane closest to the old image rows, e3 completes
    e1 = -t_mid / np.linalg.norm(t_mid)
    e2 = np.cross([0.0, 0.0, 1.0], e1)
    n = np.linalg.norm(e2)
    e2 = np.array([0.0, 1.0, 0.0]) if n < 1e-9 else e2 / n
    e3 = np.cross(e1, e2)
    Rw = np.stack([e1, e2, e3], axis=0)
    R1 = Rw @ Rh                         # applied to left-camera coords
    R2 = Rw @ Rh.T                       # = Rw R**-0.5, applied to right

    f_new = 0.5 * (float(K0[0, 0]) + float(K0[1, 1]))
    K_new = np.array([[f_new, 0, width / 2.0],
                      [0, f_new, height / 2.0],
                      [0, 0, 1.0]])
    map_l = build_rectify_map(K_new, np.asarray(K0, np.float64), tuple(d0),
                              R1, height, width)
    map_r = build_rectify_map(K_new, np.asarray(K1, np.float64), tuple(d1),
                              R2, height, width)
    cam_cfg = CameraConfig(width=width, height=height, fx=f_new, fy=f_new,
                           cx=width / 2.0, cy=height / 2.0, baseline=b)
    return map_l, map_r, cam_cfg


class StereoRectifier:
    """Device-side raw->rectified image warp (the cv::remap stage of
    rectifyImagesLR), jitted once and reused every frame."""

    def __init__(self, map_l: np.ndarray, map_r: np.ndarray):
        import jax
        self.map_l = jnp.asarray(map_l)
        self.map_r = jnp.asarray(map_r)
        self._fn = jax.jit(
            lambda il, ir, ml, mr: (remap_bilinear(il, ml),
                                    remap_bilinear(ir, mr)))

    def __call__(self, img_l, img_r):
        return self._fn(jnp.asarray(img_l), jnp.asarray(img_r),
                        self.map_l, self.map_r)


def remap_bilinear(img: jnp.ndarray, mapping: jnp.ndarray) -> jnp.ndarray:
    """Device-side bilinear remap: (H, W) image, (H', W', 2) (u, v) map.

    The gather form of cv::remap. Out-of-bounds samples read as 0.
    """
    H, W = img.shape[-2], img.shape[-1]
    u = mapping[..., 0]
    v = mapping[..., 1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0

    def tap(vi, ui):
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        uic = jnp.clip(ui, 0, W - 1)
        vic = jnp.clip(vi, 0, H - 1)
        val = img[..., vic, uic]
        return jnp.where(inb, val, 0.0)

    p00 = tap(v0, u0)
    p01 = tap(v0, u0 + 1)
    p10 = tap(v0 + 1, u0)
    p11 = tap(v0 + 1, u0 + 1)
    top = p00 * (1 - fu) + p01 * fu
    bot = p10 * (1 - fu) + p11 * fu
    return top * (1 - fv) + bot * fv
