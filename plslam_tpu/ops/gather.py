"""Arbitrary-index gathers executed on the MXU/VPU instead of the TPU's
serialized gather unit.

XLA lowers ``vals[idx]`` on TPU to a scalar-unit gather (~1 index/cycle;
measured ~0.6 M gathered elements/s standalone on this chip). For the
index counts the line detector and loop subsystems need (10^4-10^5 per
program), a two-level one-hot contraction is orders of magnitude faster:

    vals (n,[k]) reshaped to (nb, 128, [k]) blocks
    level 1: one-hot over block id  -> (m, nb) @ (nb, 128k) matmul (MXU)
    level 2: one-hot over lane id   -> masked row reduction     (VPU)

Exactness: the level-1 matmul runs at HIGHEST precision (bf16x3+ passes,
f32-exact for these magnitudes). Integer payloads are split into two
16-bit lanes before the f32 contraction and recombined after, so EVERY
int32/uint32 value round-trips exactly (not just |v| < 2^24) — the
label-propagation pointer jumps and slot-id remaps rely on this.

Same design family as ops/image.bilinear_sample_mxu (reference parity:
none — this is TPU plumbing the C++ reference never needed).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_BLOCK = 128


_M_CHUNK = 65536


def take_mxu(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``vals[idx]`` for (n,) or (n, k) float/int vals and (m,) or
    multi-dim int32 idx (output keeps idx's shape [+ (k,)]).

    Out-of-range indices are clamped to [0, n). k must be small (the
    (m, 128*k) level-1 product is materialized per call). Index sets
    larger than 64k are processed in static chunks to bound the one-hot
    intermediates.
    """
    squeeze = vals.ndim == 1
    if squeeze:
        vals = vals[:, None]
    idx_shape = idx.shape
    idx = idx.reshape(-1)
    n, k = vals.shape
    out_dtype = vals.dtype
    int_in = jnp.issubdtype(vals.dtype, jnp.integer)
    if int_in:
        # split into (hi, lo) 16-bit lanes: each lane's magnitude stays
        # below 2^16 << 2^24 (f32-exact), so arbitrary int32 payloads
        # survive the float contraction; recombined after the gather
        w32 = vals.astype(jnp.int32)
        vals = jnp.concatenate([w32 >> 16, w32 & 0xFFFF], axis=-1)
        k = 2 * k
    v = vals.astype(jnp.float32)
    nb = -(-n // _BLOCK)
    pad = nb * _BLOCK - n
    if pad:
        v = jnp.pad(v, ((0, pad), (0, 0)))
    V = v.reshape(nb, _BLOCK * k)

    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    m = idx.shape[0]

    def chunk(ix):
        mc = ix.shape[0]
        hi = ix // _BLOCK
        lo = ix % _BLOCK
        oh_hi = (hi[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
                 ).astype(jnp.float32)                     # (mc, nb)
        rows = jnp.dot(oh_hi, V, precision=lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (mc, 128k)
        oh_lo = (lo[:, None] == jnp.arange(_BLOCK, dtype=jnp.int32)[None, :]
                 ).astype(jnp.float32)                     # (mc, 128)
        return jnp.einsum("mbk,mb->mk", rows.reshape(mc, _BLOCK, k), oh_lo,
                          precision=lax.Precision.HIGHEST)

    if m <= _M_CHUNK:
        out = chunk(idx)
    else:
        mp = -(-m // _M_CHUNK) * _M_CHUNK
        ixp = jnp.pad(idx, (0, mp - m))
        out = jnp.concatenate([chunk(ixp[o:o + _M_CHUNK])
                               for o in range(0, mp, _M_CHUNK)])[:m]
    if int_in:
        w = jnp.round(out).astype(jnp.int32)
        k = k // 2
        out = ((w[:, :k] << 16) | (w[:, k:] & 0xFFFF)).astype(out_dtype)
    out = out[:, 0] if squeeze else out
    return out.reshape(idx_shape if squeeze else idx_shape + (k,))
