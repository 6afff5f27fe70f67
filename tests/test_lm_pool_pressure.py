"""Landmark-pool pressure culling (MappingConfig.lm_pool_high_water):
past the high water mark the weakest mature landmarks retire so new
structure can keep being mapped — the fixed-capacity analogue of
removeBadMapLandmarks (the round-5 endurance run measured 10-30x
late-sequence accuracy decay when the saturated pool silently stopped
admitting new landmarks)."""

import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.backend.map import cull_landmarks, init_map_state


def _cfg(P=256):
    return SlamConfig().with_updates({
        "mapping": {"max_points": P, "max_lines": 64,
                    "window_kfs": 2, "fixed_kfs": 1},
        "points": {"max_kpts": 64},
        "lines": {"max_lines": 16},
    })


def _fill(state, n, nobs, last_kf):
    P = state.pt_pos.shape[0]
    valid = np.zeros((P,), bool)
    valid[:n] = True
    return state._replace(
        pt_valid=jnp.asarray(valid),
        pt_nobs=jnp.asarray(np.where(valid, nobs, 0).astype(np.int32)),
        pt_last_kf=jnp.asarray(
            np.where(valid, last_kf, -1).astype(np.int32)),
        n_kfs=jnp.asarray(40, jnp.int32))


def test_below_high_water_no_pressure_cull():
    cfg = _cfg()
    P = cfg.mapping.max_points
    rng = np.random.default_rng(0)
    n = int(0.5 * P)
    st = _fill(init_map_state(cfg), n,
               rng.integers(3, 10, P), rng.integers(5, 30, P))
    out = cull_landmarks(st, cfg)
    # mature + recently-enough observed: nothing culled
    assert int(jnp.sum(out.pt_valid)) == n


def test_pressure_cull_retires_weakest_oldest():
    cfg = _cfg()
    P = cfg.mapping.max_points
    n = int(0.95 * P)                 # above the 0.92 high water mark
    nobs = np.full((P,), 20, np.int64)
    last = np.full((P,), 30, np.int64)
    weak = list(range(0, 40))         # few obs, old
    for s in weak:
        nobs[s] = 3
        last[s] = 5
    st = _fill(init_map_state(cfg), n, nobs, last)
    out = cull_landmarks(st, cfg)
    valid = np.asarray(jax.device_get(out.pt_valid))
    n_evict = max(int(cfg.mapping.lm_pool_evict_frac * P), 1)   # 16
    assert int(valid.sum()) == n - n_evict
    # every evicted slot is one of the weak/old ones
    evicted = np.nonzero(~valid[:n])[0]
    assert set(evicted.tolist()) <= set(weak), evicted


def test_pressure_cull_protects_window_recent():
    cfg = _cfg()
    P = cfg.mapping.max_points
    n = int(0.95 * P)
    nobs = np.full((P,), 3, np.int64)         # everyone weak...
    last = np.full((P,), 39, np.int64)        # ...but window-recent
    st = _fill(init_map_state(cfg), n, nobs, last)
    out = cull_landmarks(st, cfg)
    # nothing is removable (all inside the window span) -> no eviction
    assert int(jnp.sum(out.pt_valid)) == n


def test_pressure_cull_detaches_observations():
    cfg = _cfg()
    P = cfg.mapping.max_points
    n = int(0.95 * P)
    nobs = np.full((P,), 20, np.int64)
    last = np.full((P,), 30, np.int64)
    nobs[0] = 3
    last[0] = 2                               # guaranteed eviction
    st = _fill(init_map_state(cfg), n, nobs, last)
    # bind an observation row to landmark 0
    obs = np.array(jax.device_get(st.obs_pt_lm))
    obs[3, :5] = 0
    st = st._replace(obs_pt_lm=jnp.asarray(obs))
    out = cull_landmarks(st, cfg)
    assert not bool(out.pt_valid[0])
    assert int(jnp.sum(out.obs_pt_lm == 0)) == 0, \
        "evicted landmark's observations must be detached"
