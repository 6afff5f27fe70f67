"""Phase attribution for detect_segments on the real TPU.

block_until_ready does not reliably synchronize on this remote runtime;
every timing below fetches a small output slice with device_get. Phases
are truncated variants of the real detector; deltas between consecutive
variants attribute cost. Ad hoc tool, not part of the suite.
"""
import os
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax
    from plslam_tpu.ops.image import sobel_gradients
    from plslam_tpu.ops import lines as L

    B, H, W = 40, 376, 1241
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))

    tile, stride = 16, 8
    grad_th = 5.3 / 255.0
    diag = (H * H + W * W) ** 0.5
    merge_iters = 9
    Th = (H - tile) // stride + 1
    Tw = (W - tile) // stride + 1
    n = Th * Tw

    def detect_phase(img, upto):
        if upto == 0:
            return img[:8, :8]
        gx, gy = sobel_gradients(img)
        mag = jnp.sqrt(gx * gx + gy * gy)
        w = jnp.where(mag > grad_th, mag, 0.0)
        if upto == 1:
            return w[:8, :8]
        mag_safe = jnp.maximum(mag, 1e-9)
        d2x = jnp.where(w > 0, (gx * gx - gy * gy) / mag_safe, 0.0)
        d2y = jnp.where(w > 0, 2.0 * gx * gy / mag_safe, 0.0)
        S, Sx, Sy, Sxx, Syy, Sxy, D2x, D2y = L.tile_moment_maps(
            w, d2x, d2y, tile, stride)
        if upto == 2:
            return S[:8, :8] + Sx[:8, :8] + Sxx[:8, :8] + D2y[:8, :8]
        S_safe = jnp.maximum(S, 1e-6)
        cx, cy = Sx / S_safe, Sy / S_safe
        cxx = Sxx / S_safe - cx * cx
        cyy = Syy / S_safe - cy * cy
        cxy = Sxy / S_safe - cx * cy
        l1, l2, dx, dy = L._principal_axis(cxx, cyy, cxy)
        l1, l2 = jnp.maximum(l1, 0.0), jnp.maximum(l2, 0.0)
        elong = jnp.sqrt(l1 / jnp.maximum(l2, 1e-4))
        coher = jnp.sqrt(D2x * D2x + D2y * D2y) / S_safe
        tile_ok = (S > tile) & (elong > 2.5) & (coher > 0.6)
        if upto == 3:
            return jnp.sum(tile_ok).reshape(1, 1).astype(jnp.float32)
        idx0 = jnp.arange(n, dtype=jnp.int32).reshape(Th, Tw)
        BIG = jnp.int32(n + 7)
        labels = jnp.where(tile_ok, idx0, BIG)

        def prop(_, labv):
            new = labv
            for (di, dj) in [(0, 1), (1, 0), (1, 1), (1, -1)]:
                rolled = jnp.roll(labv, (-di, -dj), (0, 1))
                new = jnp.minimum(new, jnp.where(tile_ok, rolled, BIG))
            flatl = new.reshape(-1)
            tgt = jnp.where(flatl < n, flatl, 0)
            hopped = jnp.where(flatl < n,
                               jnp.minimum(flatl, flatl[tgt]), flatl)
            return hopped.reshape(Th, Tw)

        labels = lax.fori_loop(0, merge_iters, prop, labels)
        if upto == 4:
            return jnp.sum(labels).reshape(1, 1).astype(jnp.float32)
        lab = labels.reshape(-1)
        valid_t = tile_ok.reshape(-1)
        n_slots = n + 8

        def scat(v):
            return jnp.zeros((n_slots,), v.dtype).at[lab].add(
                jnp.where(valid_t, v, 0.0))

        payload = jnp.stack([S.reshape(-1), Sx.reshape(-1), Sy.reshape(-1),
                             Sxx.reshape(-1), Syy.reshape(-1),
                             Sxy.reshape(-1), jnp.ones((n,), jnp.float32)],
                            axis=-1)
        payload = jnp.where(valid_t[:, None], payload, 0.0)
        agg = jnp.zeros((n_slots, 7), jnp.float32).at[lab].add(payload)
        mS, mSx, mSy, mSxx, mSyy, mSxy, owns = [agg[:, i] for i in range(7)]
        if upto == 5:
            return (mS + mSx + mSy + mSxx + mSyy + mSxy + owns)[:64].reshape(8, 8)
        mS_safe = jnp.maximum(mS, 1e-6)
        mcx, mcy = mSx / mS_safe, mSy / mS_safe
        mcxx = mSxx / mS_safe - mcx * mcx
        mcyy = mSyy / mS_safe - mcy * mcy
        mcxy = mSxy / mS_safe - mcx * mcy
        _, _, mdx, mdy = L._principal_axis(mcxx, mcyy, mcxy)
        half_ext = jnp.sqrt(jnp.maximum(12.0 * l1, 0.0)).reshape(-1) * 0.5
        proj_c = ((cx.reshape(-1) - mcx[lab]) * mdx[lab]
                  + (cy.reshape(-1) - mcy[lab]) * mdy[lab])
        INF = jnp.float32(1e9)
        ext = jnp.stack([proj_c - half_ext, -(proj_c + half_ext)], axis=-1)
        ext = jnp.where(valid_t[:, None], ext, INF)
        pext = jnp.full((n_slots, 2), INF).at[lab].min(ext)
        pmin, pmax = pext[:, 0], -pext[:, 1]
        if upto == 6:
            return (pmin + pmax)[:64].reshape(8, 8)
        slot_ids = jnp.arange(n_slots, dtype=jnp.int32)
        root_ok = (mS > 0) & (owns > 0) & (slot_ids < n)
        length = jnp.where(root_ok, pmax - pmin, 0.0)
        seg_ok = root_ok & (length > 0.025 * diag)
        score = jnp.where(seg_ok, mS, 0.0)
        top_s, top_i = lax.top_k(score, 128)
        sp = jnp.stack([mcx + pmin * mdx, mcy + pmin * mdy], axis=-1)
        out = jnp.take(sp, top_i, axis=0)
        return out[:, :1].reshape(8, 16) + top_s.reshape(8, 16)

    def bench(upto, iters=6):
        f = jax.jit(lambda x, i: jax.vmap(
            lambda im: detect_phase(im, upto))(jnp.roll(x, i, axis=0)))
        jax.device_get(f(base, 0))
        t0 = time.perf_counter()
        for i in range(iters):
            jax.device_get(f(base, i + 1))
        return (time.perf_counter() - t0) / iters

    names = {0: "identity (rig floor)", 1: "sobel+planes", 2: "+moments",
             3: "+gates", 4: "+labelprop", 5: "+scatter-fused",
             6: "+endpoints", 7: "+topk(all)"}
    prev = 0.0
    for upto in range(0, 8):
        dt = bench(upto)
        print(f"{names[upto]:14s}: {dt*1e3:8.2f} ms/call "
              f"(+{(dt-prev)*1e3:7.2f})  [{dt*1e3/(B/2):6.3f} ms/frame]")
        prev = dt


if __name__ == "__main__":
    main()
