"""Pin the compact-root-space line refit against a full-membership
reference.

Round 4 replaced the per-label refit's full-width formulation with a
compact (R, n) root-space aggregation (ops.lines.refit_roots: roots by
top-k own-tile mass, membership as a one-hot compare, all aggregation
as MXU contractions). This test replays the SAME label field through an
uncapped, float64, loop-over-labels numpy implementation of the
parallel-axis moment merge + principal-axis refit and requires the
compact path to reproduce every segment — so any future "optimization"
of the refit math trips here before it can shift detection behavior.

Reference parity: the per-region line-support refit inside the vendored
``LSDDetector`` region grower (pl-slam 3rdparty line_descriptor).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.ops.lines import refit_roots, tile_stage

TILE = 16
STRIDE = TILE // 2
MIN_LENGTH = 12.0


def _np_full_membership_refit(ts, H, W, min_length):
    """Uncapped float64 refit: one pass per surviving label."""
    flat = lambda a: np.asarray(jax.device_get(a), np.float64).reshape(-1)
    lab = np.asarray(jax.device_get(ts.labels)).reshape(-1)
    valid = np.asarray(jax.device_get(ts.tile_ok)).reshape(-1)
    S, Sx, Sy = flat(ts.S), flat(ts.Sx), flat(ts.Sy)
    Sxx, Syy, Sxy = flat(ts.Sxx), flat(ts.Syy), flat(ts.Sxy)
    cx, cy = flat(ts.cx), flat(ts.cy)
    cx_l, cy_l = flat(ts.cx_l), flat(ts.cy_l)
    l1 = flat(ts.l1)

    x0, y0 = 0.5 * W, 0.5 * H
    dxc = cx - cx_l - x0
    dyc = cy - cy_l - y0
    Sx_c = Sx + dxc * S
    Sy_c = Sy + dyc * S
    Sxx_c = Sxx + 2.0 * dxc * Sx + dxc * dxc * S
    Syy_c = Syy + 2.0 * dyc * Sy + dyc * dyc * S
    Sxy_c = Sxy + dyc * Sx + dxc * Sy + dxc * dyc * S
    he = np.sqrt(np.maximum(12.0 * l1, 0.0)) * 0.5

    n = lab.size
    roots = sorted(set(int(lab[i]) for i in range(n)
                       if valid[i] and lab[i] == i))
    out = []
    for r in roots:
        m = valid & (lab == r)
        mS = S[m].sum()
        if mS <= 0:
            continue
        mcx = Sx_c[m].sum() / mS
        mcy = Sy_c[m].sum() / mS
        C = np.array([
            [Sxx_c[m].sum() / mS - mcx * mcx,
             Sxy_c[m].sum() / mS - mcx * mcy],
            [Sxy_c[m].sum() / mS - mcx * mcy,
             Syy_c[m].sum() / mS - mcy * mcy]])
        w_eig, V = np.linalg.eigh(C)
        d = V[:, int(np.argmax(w_eig))]
        proj = ((cx[m] - x0) * d[0] + (cy[m] - y0) * d[1]
                - (d[0] * mcx + d[1] * mcy))
        pmin = np.min(proj - he[m])
        pmax = np.max(proj + he[m])
        length = pmax - pmin
        if length <= min(0.75 * TILE + STRIDE, min_length):
            continue
        sp = np.array([mcx + x0 + pmin * d[0], mcy + y0 + pmin * d[1]])
        ep = np.array([mcx + x0 + pmax * d[0], mcy + y0 + pmax * d[1]])
        out.append((mS, sp, ep))
    return out


def _render_field(seed, H=160, W=200, n_lines=6):
    """Random noise + randomly-placed bright line strips."""
    rng = np.random.default_rng(seed)
    img = rng.random((H, W)).astype(np.float32) * 0.06
    for _ in range(n_lines):
        x0 = rng.uniform(10, W - 10)
        y0 = rng.uniform(10, H - 10)
        th = rng.uniform(0, np.pi)
        L = rng.uniform(40, 120)
        t = np.linspace(-L / 2, L / 2, int(3 * L))
        xs = np.clip(x0 + t * np.cos(th), 0, W - 1).astype(int)
        ys = np.clip(y0 + t * np.sin(th), 0, H - 1).astype(int)
        img[ys, xs] = 1.0
    return img


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_compact_refit_equals_full_membership(seed):
    img = _render_field(seed)
    H, W = img.shape
    max_lines = 48                 # R = 8*max_lines >> surviving roots
    ts = tile_stage(jnp.asarray(img), tile=TILE)
    sp_c, ep_c, score_c = jax.device_get(
        refit_roots(ts, H, W, TILE, max_lines, MIN_LENGTH))
    got = [(float(s), np.asarray(sp_c[i], np.float64),
            np.asarray(ep_c[i], np.float64))
           for i, s in enumerate(score_c) if s > 0]
    ref = _np_full_membership_refit(ts, H, W, MIN_LENGTH)
    assert ref, "degenerate case: no reference segments — fix the field"
    # capacity: every uncapped reference root must appear in the compact
    # output (within the 2*max_lines stage-1 cap, far above n_ref here)
    assert len(ref) <= 2 * max_lines
    assert len(got) == len(ref), (
        f"compact path returned {len(got)} segments, reference "
        f"{len(ref)} — the R/top-k capping dropped or invented roots")
    used = set()
    for mS, sp, ep in ref:
        best, best_i = None, None
        for i, (s_g, sp_g, ep_g) in enumerate(got):
            if i in used or abs(s_g - mS) > 1e-3 * max(mS, 1.0):
                continue
            d = min(np.linalg.norm(sp_g - sp) + np.linalg.norm(ep_g - ep),
                    np.linalg.norm(sp_g - ep) + np.linalg.norm(ep_g - sp))
            if best is None or d < best:
                best, best_i = d, i
        assert best is not None, (
            f"reference segment (mass {mS:.1f}) has no compact match")
        assert best < 1.0, (
            f"endpoint divergence {best:.3f}px for mass-{mS:.1f} segment")
        used.add(best_i)


def test_refit_respects_capacity_ordering():
    """When more roots survive than the stage-1 cap, the compact path
    must keep the HIGHEST-mass ones (top-k semantics, not arbitrary)."""
    img = _render_field(7, n_lines=10)
    H, W = img.shape
    max_lines = 2                  # tiny cap: 2*max_lines = 4 slots
    ts = tile_stage(jnp.asarray(img), tile=TILE)
    _, _, score_c = jax.device_get(
        refit_roots(ts, H, W, TILE, max_lines, MIN_LENGTH))
    ref = _np_full_membership_refit(ts, H, W, MIN_LENGTH)
    ref_masses = sorted((m for m, _, _ in ref), reverse=True)
    got_masses = sorted((float(s) for s in score_c if s > 0), reverse=True)
    for g, r in zip(got_masses, ref_masses):
        assert abs(g - r) < 1e-3 * max(r, 1.0)
