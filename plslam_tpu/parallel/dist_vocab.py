"""Sharded place-recognition retrieval.

NEW capability (SURVEY.md §2.3 P7): the DBoW2-equivalent database scales
by sharding the per-KF BoW matrix across devices; a query scores its
local shard (one matvec on each device), takes a local top-k, and
merges with an all_gather — retrieval over an arbitrarily large KF
database at constant per-device cost.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from plslam_tpu.loop.vocabulary import l1_score
from plslam_tpu.parallel.mesh import make_mesh, shard_map_fn


def make_sharded_query(mesh, axis: str = "kf", k: int = 8):
    """Build fn(bows_shard (F, D) sharded on F, query (D,)) ->
    (top-k global scores, top-k global KF indices)."""
    n_dev = mesh.shape[axis]

    def local_query(bows, q):
        # bows: (F/n_dev, D) local shard
        me = jax.lax.axis_index(axis)
        n_local = bows.shape[0]
        s = l1_score(bows, q[None, :])                  # (F/n,)
        top_s, top_i = jax.lax.top_k(s, k)
        top_i = top_i + me * n_local                    # globalize indices
        all_s = jax.lax.all_gather(top_s, axis)         # (n_dev, k)
        all_i = jax.lax.all_gather(top_i, axis)
        merged_s, sel = jax.lax.top_k(all_s.reshape(-1), k)
        merged_i = jnp.take(all_i.reshape(-1), sel)
        return merged_s, merged_i

    fn = shard_map_fn(local_query, mesh,
                      in_specs=(P(axis, None), P()),
                      out_specs=(P(), P()), check=False)
    return jax.jit(fn)
