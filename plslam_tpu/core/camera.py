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
