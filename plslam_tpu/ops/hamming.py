"""Binary-descriptor distance + nearest-neighbor matching on the MXU.

Reference parity: stvo-pl ``src/matching.cpp`` — ``distance`` (popcount
Hamming), ``matchNNR`` (NN with Lowe-ratio test), ``matchGrid``
(grid-windowed search) and the ``best_lr_matches`` mutual check.

The TPU-native trick: with bits mapped to {-1, +1}, the Hamming distance
is an inner product — ``ham = (256 - a.b) / 2`` — so an entire NxM
distance matrix is ONE bfloat16 matmul on the systolic array (exact:
products are +-1 and f32 accumulation is integral). The reference's
spatial grid hash becomes a mask added to the distance matrix; windowed
search is pure arithmetic, not data structures.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

N_BITS = 256
INVALID = jnp.float32(1e9)


def bits_to_pm1(bits: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 256) {0,1} -> (N, 256) {-1,+1} in matmul dtype."""
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray,
                   valid_a: Optional[jnp.ndarray] = None,
                   valid_b: Optional[jnp.ndarray] = None,
                   bf16: bool = True) -> jnp.ndarray:
    """(N, 256), (M, 256) bit arrays -> (N, M) float32 Hamming distances.

    Invalid rows/cols are pushed to a large distance so downstream argmins
    never select them.
    """
    dt = jnp.bfloat16 if bf16 else jnp.float32
    a = bits_to_pm1(bits_a, dt)
    b = bits_to_pm1(bits_b, dt)
    sim = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    dist = (N_BITS - sim) * 0.5
    if valid_a is not None:
        dist = jnp.where(valid_a[:, None], dist, INVALID)
    if valid_b is not None:
        dist = jnp.where(valid_b[None, :], dist, INVALID)
    return dist


class MatchResult(NamedTuple):
    idx: jnp.ndarray        # (N,) int32 index into B, -1 if unmatched
    dist: jnp.ndarray       # (N,) float32 best distance
    valid: jnp.ndarray      # (N,) bool


def match_nnr(dist: jnp.ndarray, max_dist: float, ratio: float,
              mutual: bool = True) -> MatchResult:
    """Nearest-neighbor matching with ratio test on a masked distance matrix.

    matching.cpp::matchNNR parity: best < ratio * second_best, best below
    the absolute gate, optional mutual-best (best_lr_matches) check.
    """
    n, m = dist.shape
    best = jnp.argmin(dist, axis=1)
    d1 = jnp.min(dist, axis=1)
    # second best: mask out the best column per row
    cols = jnp.arange(m)[None, :]
    dist2 = jnp.where(cols == best[:, None], INVALID, dist)
    d2 = jnp.min(dist2, axis=1)
    ok = (d1 <= max_dist) & (d1 < ratio * d2)
    if mutual:
        best_rev = jnp.argmin(dist, axis=0)          # (M,)
        ok = ok & (jnp.take(best_rev, best) == jnp.arange(n))
    idx = jnp.where(ok, best, -1)
    return MatchResult(idx.astype(jnp.int32), d1, ok)


def window_mask(pos_a: jnp.ndarray, pos_b: jnp.ndarray, radius: float,
                circular: bool = False) -> jnp.ndarray:
    """(N, 2), (M, 2) predicted/actual positions -> (N, M) bool in-window.

    The arithmetic replacement of gridStructure.cpp's windowed cell query.
    """
    d = pos_a[:, None, :] - pos_b[None, :, :]
    if circular:
        return jnp.sum(d * d, axis=-1) <= radius * radius
    return (jnp.abs(d[..., 0]) <= radius) & (jnp.abs(d[..., 1]) <= radius)


def apply_mask(dist: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask, dist, INVALID)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) {0,1} uint8 -> (N, 8) uint32 packed (for compact storage)."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) uint8 {0,1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return b.reshape(packed.shape[0], 256).astype(jnp.uint8)
