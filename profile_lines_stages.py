"""Cumulative stage ablation of the full-res line detector."""
import os, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.ops import lines as L
    from plslam_tpu.ops.image import sobel_gradients, resize_bilinear
    from plslam_tpu.ops import lbd

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    seq = synthetic.make_sequence(cam, n_frames=41, seed=0, n_points=500,
                                  n_lines=60, noise=0.003, step=0.25)
    flat = jnp.concatenate([jnp.asarray(np.asarray(seq.images_l))[1:21],
                            jnp.asarray(np.asarray(seq.images_r))[1:21]], axis=0)
    jax.block_until_ready(flat)
    l = cfg.lines
    H, W = flat.shape[1:]
    diag = (H*H + W*W) ** 0.5
    tile, stride = l.tile, l.tile // 2
    grad_th = l.grad_th / 255.0

    def sync(fn, reps=3):
        f = jax.jit(lambda ims: fn(ims))
        out = f(flat); jax.block_until_ready(out)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        ts=[]
        for _ in range(reps):
            t0=time.perf_counter(); out=f(flat)
            for leaf in jax.tree_util.tree_leaves(out): jax.device_get(leaf)
            ts.append((time.perf_counter()-t0)*1e3)
        return sorted(ts)[1]

    def upto(stage):
        def one(img):
            gx, gy = sobel_gradients(img)
            mag = jnp.sqrt(gx*gx + gy*gy)
            w = jnp.where(mag > grad_th, mag, 0.0)
            if stage == "sobel":
                return jnp.sum(w)
            mag_safe = jnp.maximum(mag, 1e-9)
            d2x = jnp.where(w > 0, (gx*gx - gy*gy)/mag_safe, 0.0)
            d2y = jnp.where(w > 0, 2.0*gx*gy/mag_safe, 0.0)
            D2x, D2y = L.orientation_maps(d2x, d2y, tile, stride)
            if stage == "pass1":
                return jnp.sum(D2x) + jnp.sum(D2y)
            d2n = jnp.sqrt(D2x*D2x + D2y*D2y) + 1e-9
            u2x, u2y = D2x/d2n, D2y/d2n
            Th0, Tw0 = u2x.shape
            def up(m):
                full = jnp.broadcast_to(m[:,None,:,None], (Th0, stride, Tw0, stride)).reshape(Th0*stride, Tw0*stride)
                return jnp.pad(full, ((stride//2, H-Th0*stride-stride//2),
                                      (stride//2, W-Tw0*stride-stride//2)), mode="edge")
            align_px = (d2x*up(u2x) + d2y*up(u2y)) / jnp.maximum(w, 1e-9)
            ratio = jnp.square(jnp.maximum(align_px, 0.0))
            S,Sx,Sy,Sxx,Syy,Sxy,D2x2,D2y2 = L.tile_moment_maps(w*ratio, d2x*ratio, d2y*ratio, tile, stride)
            if stage == "pass2":
                return sum(jnp.sum(a) for a in (S,Sx,Sy,Sxx,Syy,Sxy,D2x2,D2y2))
            return None
        return lambda ims: jax.vmap(one)(ims)

    print(f"sobel+weights      : {sync(upto('sobel')):7.1f} ms")
    print(f"+pass1 orient maps : {sync(upto('pass1')):7.1f} ms")
    print(f"+reweight+pass2    : {sync(upto('pass2')):7.1f} ms")

    def detfull(ims):
        return jax.vmap(lambda im: L.detect_segments(
            im, max_lines=l.max_lines, tile=tile, grad_th=grad_th,
            min_support=l.min_support, elong_th=l.elong_th,
            perp_spread_th=l.perp_spread_th, coherence_th=l.coherence_th,
            merge_iters=max(l.merge_iters*3, 8), merge_ang_th=l.merge_ang_th,
            merge_dist_th=l.merge_dist_th, merge_gap_th=l.merge_gap_th,
            min_length=l.min_line_length*diag))(ims)
    def detsum(ims):
        s = detfull(ims)
        return jnp.sum(s.sp) + jnp.sum(s.score)
    print(f"full detect (L0)   : {sync(detsum):7.1f} ms")

    def lbdsum(ims):
        segs = detfull(ims)
        def one(img, sp, ep):
            small = resize_bilinear(img, (H//2, W//2))
            gx, gy = sobel_gradients(small)
            return lbd.describe_lines(small, sp*0.5, ep*0.5, n_bands=l.lbd_bands,
                                      band_width=max(l.lbd_band_width//2,3),
                                      n_samples=l.lbd_samples,
                                      samples_per_band=l.lbd_band_samples,
                                      gx=gx, gy=gy)
        d = jax.vmap(one)(ims, segs.sp, segs.ep)
        return jnp.sum(d) + jnp.sum(segs.sp)
    print(f"detect+LBD (L0)    : {sync(lbdsum):7.1f} ms")
main()
