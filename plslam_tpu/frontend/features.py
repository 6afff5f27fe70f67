"""Fixed-capacity feature containers (struct-of-arrays).

Reference parity: stvo-pl ``include/stereoFeatures.h`` —
``PointFeature`` / ``LineFeature``. The C++ versions are heap objects in
std::vectors; here each frame's features are fixed-capacity SoA arrays
with validity masks, so every downstream stage is a static-shape XLA
program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PointObservations(NamedTuple):
    """Stereo-matched point features of one frame (capacity K, masked).

    Mirrors PointFeature: pl (uv), pl' right pixel, disparity, 3D point P,
    octave/angle/response, inlier flag -> valid mask.
    """
    uv: jnp.ndarray        # (K, 2) left pixel, level-0 coords
    uv_r: jnp.ndarray      # (K, 2) right pixel
    disp: jnp.ndarray      # (K,)
    P: jnp.ndarray         # (K, 3) 3D in this frame's left-camera frame
    desc: jnp.ndarray      # (K, 256) uint8 bits
    octave: jnp.ndarray    # (K,) int32
    angle: jnp.ndarray     # (K,)
    score: jnp.ndarray     # (K,)
    valid: jnp.ndarray     # (K,) bool — detected AND stereo-matched

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


class LineObservations(NamedTuple):
    """Stereo-matched line-segment features (capacity L, masked).

    Mirrors LineFeature: spl/epl 2D endpoints, le (homogeneous line
    equation), sdisp/edisp, 3D endpoints sP/eP, angle, inlier flag.
    """
    sp: jnp.ndarray        # (L, 2) start endpoint, left image
    ep: jnp.ndarray        # (L, 2) end endpoint, left image
    le: jnp.ndarray        # (L, 3) normalized line equation sp x ep
    angle: jnp.ndarray     # (L,)
    sdisp: jnp.ndarray     # (L,)
    edisp: jnp.ndarray     # (L,)
    sP: jnp.ndarray        # (L, 3) 3D start
    eP: jnp.ndarray        # (L, 3) 3D end
    desc: jnp.ndarray      # (L, 256) uint8 LBD bits
    score: jnp.ndarray     # (L,) detector support strength
    valid: jnp.ndarray     # (L,) bool

    @property
    def capacity(self) -> int:
        return self.sp.shape[0]


def line_equation(sp: jnp.ndarray, ep: jnp.ndarray) -> jnp.ndarray:
    """Normalized homogeneous 2D line through two pixels: le = sp x ep,
    scaled so (le_0, le_1) is a unit normal — then le . (u, v, 1) is the
    signed perpendicular distance (the reference's line residual)."""
    sph = jnp.concatenate([sp, jnp.ones_like(sp[..., :1])], axis=-1)
    eph = jnp.concatenate([ep, jnp.ones_like(ep[..., :1])], axis=-1)
    le = jnp.cross(sph, eph)
    n = jnp.sqrt(le[..., 0] ** 2 + le[..., 1] ** 2)
    return le / jnp.maximum(n, 1e-9)[..., None]
