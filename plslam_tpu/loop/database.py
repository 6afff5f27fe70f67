"""BoW keyframe database: inverted-file retrieval as dense matvec.

Reference parity: pl-slam ``3rdparty/DBoW2`` ``TemplatedDatabase`` +
``mapHandler.cpp :: insertKFBowVectorP/L, lookForLoopCandidates``.
DBoW2's inverted index exists to sparsify CPU scoring; on TPU the dense
(F, n_leaves) score matvec is faster than pointer chasing, so the
"index" is simply the stacked BoW matrix. Dual vocabularies (points +
lines) with fused scores, covisible-score normalization and temporal
consistency voting as in the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.loop.vocabulary import Vocabulary


class BowDatabase:
    """Device BoW state for the loop closer: the two vocabularies plus
    the dense (F, n_leaves) BoW matrices for points and lines.

    The insert/query WORK happens inside the fused per-KF probe
    (loop.loop_closer.probe_core — insertKFBowVectorP/L + the database
    matvec in one program); this class only owns the state those
    programs thread through."""

    def __init__(self, cfg: SlamConfig, voc_p: Vocabulary,
                 voc_l: Optional[Vocabulary] = None):
        self.cfg = cfg
        self.voc_p = voc_p
        self.voc_l = voc_l
        F = cfg.mapping.max_kfs
        self.bows_p = jnp.zeros((F, voc_p.n_leaves), jnp.float32)
        self.bows_l = (jnp.zeros((F, voc_l.n_leaves), jnp.float32)
                       if voc_l is not None else None)


class LoopCandidate(NamedTuple):
    slot: int
    score: float


def select_candidates(scores: np.ndarray, slot: int, cfg: SlamConfig
                      ) -> Tuple[list, float]:
    """lookForLoopCandidates parity: normalize by the best covisible
    (temporally adjacent) score, gate with lc_mat, exclude the temporal
    neighborhood, return the top candidates."""
    lc = cfg.loop
    lo = max(slot - lc.min_kf_separation, 0)
    covis = scores[lo:slot]
    baseline = float(covis.max()) if covis.size else 1.0
    baseline = max(baseline, 1e-3)
    eligible = scores.copy()
    eligible[max(slot - lc.min_kf_separation, 0):] = 0.0
    rel = eligible / baseline
    order = np.argsort(-rel)[:lc.max_loop_candidates]
    out = [LoopCandidate(int(i), float(rel[i]))
           for i in order if rel[i] >= lc.lc_mat and eligible[i] > 0]
    return out, baseline


class ConsistencyVoter:
    """Temporal consistency: a loop fires only after the same candidate
    region is retrieved in `consistency_window` consecutive KFs."""

    def __init__(self, window: int, radius: int = 4):
        self.window = window
        self.radius = radius
        self._streaks = {}          # group center -> consecutive count

    def vote(self, candidates) -> Optional[int]:
        new_streaks = {}
        fired = None
        for c in candidates:
            best = None
            for center, count in self._streaks.items():
                if abs(c.slot - center) <= self.radius:
                    best = max(best or 0, count)
            streak = (best or 0) + 1
            new_streaks[c.slot] = max(streak, new_streaks.get(c.slot, 0))
            if streak >= self.window and fired is None:
                fired = c.slot
        self._streaks = new_streaks
        return fired
