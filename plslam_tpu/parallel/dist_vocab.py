"""Sharded place-recognition retrieval.

NEW capability (SURVEY.md §2.3 P7): the DBoW2-equivalent database scales
by sharding the per-KF BoW matrix across devices; a query scores its
local shard (one matvec on each device), takes a local top-k, and
merges with an all_gather — retrieval over an arbitrarily large KF
database at constant per-device cost.

``DistRetrieval`` is the LIVE system component (``loop.distributed``):
it owns the sharded database, mirrors every keyframe insertion, and
answers the loop closer's candidate queries (global top-k + the
covisible-baseline max that lookForLoopCandidates normalizes by) in one
sharded program. ``make_sharded_query`` remains the minimal standalone
kernel (used by the multi-chip dryrun).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from plslam_tpu.loop.vocabulary import l1_score
from plslam_tpu.parallel.mesh import make_mesh, shard_map_fn, sharding


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


class DistRetrieval:
    """Sharded DBoW2-equivalent database for the live loop closer.

    Reference parity: the retrieval half of ``3rdparty/DBoW2``
    ``TemplatedDatabase`` + ``mapHandler::lookForLoopCandidates`` —
    scaled across a 1D 'kf' device mesh. Each device holds F/n rows of
    the dense BoW matrix (both vocabularies); a query runs one local
    score matvec per device, a local top-k, an all_gather merge, and a
    pmax for the covisible baseline — constant per-device cost in
    database size. Semantics match ``loop.database.select_candidates``
    exactly (eligibility window, covisible-baseline normalization);
    equivalence is pinned by tests/test_dist_vocab.py.
    """

    def __init__(self, cfg, n_leaves_p: int,
                 n_leaves_l: Optional[int] = None, mesh=None,
                 n_devices: Optional[int] = None):
        if mesh is None:
            n = n_devices or cfg.loop.dist_devices or len(jax.devices())
            mesh = make_mesh(n, axes=("kf",))
        self.mesh = mesh
        self.n = mesh.shape["kf"]
        F = cfg.mapping.max_kfs
        assert F % self.n == 0, (
            f"mapping.max_kfs={F} must divide the {self.n}-device "
            "retrieval mesh")
        self.k = cfg.loop.max_loop_candidates
        self.sep = cfg.loop.min_kf_separation
        self._has_l = n_leaves_l is not None
        self._shard = sharding(mesh, P("kf", None))
        self.bows_p = jax.device_put(
            jnp.zeros((F, n_leaves_p), jnp.float32), self._shard)
        self.bows_l = (jax.device_put(
            jnp.zeros((F, n_leaves_l), jnp.float32), self._shard)
            if self._has_l else
            jax.device_put(jnp.zeros((F, 1), jnp.float32), self._shard))
        self._insert = jax.jit(
            lambda b, s, v: b.at[s].set(v),
            donate_argnums=0, out_shardings=self._shard)
        self._query = self._build_query()
        self._permute = None

    def insert(self, slot, vp, vl=None) -> None:
        """Mirror one keyframe's BoW vector(s) into the sharded rows."""
        s = jnp.asarray(slot)
        self.bows_p = self._insert(self.bows_p, s, vp)
        if self._has_l and vl is not None:
            self.bows_l = self._insert(self.bows_l, s, vl)

    def _build_query(self):
        k, sep, has_l = self.k, self.sep, self._has_l

        def local(bp, bl, qp, ql, slot, n_kfs):
            me = lax.axis_index("kf")
            n_local = bp.shape[0]
            gid = me * n_local + jnp.arange(n_local, dtype=jnp.int32)
            s = l1_score(bp, qp[None, :])
            if has_l:
                s = 0.5 * (s + l1_score(bl, ql[None, :]))
            # covisible baseline: best score in the temporal window
            # (lookForLoopCandidates normalization)
            covis_win = (gid >= slot - sep) & (gid < slot)
            base = lax.pmax(jnp.max(jnp.where(covis_win, s, 0.0)), "kf")
            eligible = (gid < slot - sep) & (gid < n_kfs)
            se = jnp.where(eligible, s, 0.0)
            ts, tl = lax.top_k(se, k)
            ti = jnp.take(gid, tl)
            all_s = lax.all_gather(ts, "kf").reshape(-1)
            all_i = lax.all_gather(ti, "kf").reshape(-1)
            ms, sel = lax.top_k(all_s, k)
            return ms, jnp.take(all_i, sel), base

        fn = shard_map_fn(
            local, self.mesh,
            in_specs=(P("kf", None), P("kf", None), P(), P(), P(), P()),
            out_specs=(P(), P(), P()), check=False)
        return jax.jit(fn)

    def query(self, slot: int, n_kfs: int, qp, ql=None):
        """(top-k scores, top-k global KF slots, covisible baseline)
        for the keyframe at ``slot`` (whose vectors must already be
        inserted — pass them as qp/ql)."""
        if ql is None:
            ql = jnp.zeros((self.bows_l.shape[1],), jnp.float32)
        return self._query(self.bows_p, self.bows_l, qp, ql,
                           jnp.asarray(slot, jnp.int32),
                           jnp.asarray(n_kfs, jnp.int32))

    def remap_slots(self, perm, n_valid: int) -> None:
        """Permute rows after a KF-slot compaction (same contract as
        LoopCloser.remap_slots: new row n reads old row perm[n], tail
        zeroed)."""
        F = self.bows_p.shape[0]
        if self._permute is None:
            def perm_fn(b, p, nv):
                live = jnp.arange(b.shape[0]) < nv
                return jnp.where(live[:, None], jnp.take(b, p, axis=0),
                                 0.0)
            self._permute = jax.jit(perm_fn, donate_argnums=0,
                                    out_shardings=self._shard)
        p = jnp.asarray(perm, jnp.int32)
        nv = jnp.asarray(n_valid, jnp.int32)
        self.bows_p = self._permute(self.bows_p, p, nv)
        if self._has_l:
            self.bows_l = self._permute(self.bows_l, p, nv)
