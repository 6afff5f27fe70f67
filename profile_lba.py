"""Ad-hoc profiler for LBA internals at production shapes (real TPU).

Separates one _assemble_and_solve step, one lba_cost eval, and their
pieces (residual/Jacobian passes, MAD scale, scatters, Schur solve) to
direct the mapping_step speed work. Not part of the test suite.
"""
import os


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from functools import partial
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core import robust
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.backend import lba
    from plslam_tpu.utils.devtime import device_time_ms

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    m = cfg.mapping
    W = m.window_kfs + m.fixed_kfs
    P, Mx = m.max_points, m.max_lines
    Q = 2 * Mx
    K, L = cfg.points.max_kpts, cfg.lines.max_lines

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    pt = jax.random.uniform(ks[0], (P, 3), minval=-5, maxval=5) + \
        jnp.array([0., 0., 15.])
    ep = jax.random.uniform(ks[1], (Q, 3), minval=-5, maxval=5) + \
        jnp.array([0., 0., 15.])
    pose = jnp.tile(jnp.eye(4), (W, 1, 1))
    obs_id = jax.random.randint(ks[2], (W, K), 0, P)
    obs_id = jnp.where(jax.random.uniform(ks[3], (W, K)) < 0.7, obs_id, -1)
    obs_uv = jax.random.uniform(ks[4], (W, K, 2), minval=0, maxval=300)
    obs_disp = jax.random.uniform(ks[5], (W, K), minval=1, maxval=50)
    sid = jax.random.randint(ks[6], (W, L), 0, Q)
    eid = jax.random.randint(ks[7], (W, L), 0, Q)
    le = jax.random.normal(ks[8], (W, L, 3))
    prob = lba.LBAProblem(
        kf_pose=pose, kf_fixed=jnp.zeros((W,), bool).at[0].set(True),
        kf_valid=jnp.ones((W,), bool), pt_pos=pt, ep_pos=ep,
        obs_pt_uv=obs_uv, obs_pt_disp=obs_disp, obs_pt_id=obs_id,
        obs_ln_le=le, obs_ln_sid=sid, obs_ln_eid=eid)

    f_asm = jax.jit(lambda p: lba._assemble_and_solve(p, cam, 1e-3))
    f_cost = jax.jit(lambda p: lba.lba_cost(p, cam))
    f_run = jax.jit(partial(lba.run_lba, cam=cam, cfg=cfg))
    f_rj = jax.jit(lambda p: lba._point_rj(p.kf_pose, p.pt_pos, p.obs_pt_uv,
                                           p.obs_pt_disp, p.obs_pt_id, cam))

    @jax.jit
    def f_mad(p):
        r, _, _, ok = lba._point_rj(p.kf_pose, p.pt_pos, p.obs_pt_uv,
                                    p.obs_pt_disp, p.obs_pt_id, cam)
        rn = jnp.sqrt(jnp.sum(r * r, -1) + 1e-12)
        return robust.mad_scale_zero_centered(rn.reshape(-1), ok.reshape(-1))

    @jax.jit
    def f_scatters(p):
        r, Jc, Jp, ok = lba._point_rj(p.kf_pose, p.pt_pos, p.obs_pt_uv,
                                      p.obs_pt_disp, p.obs_pt_id, cam)
        pid = jnp.maximum(p.obs_pt_id, 0)
        Hpp = jnp.zeros((P, 3, 3)).at[pid.reshape(-1)].add(
            jnp.einsum("w k i a, w k i b -> w k a b", Jp, Jp).reshape(-1, 3, 3))
        w_rows = jnp.broadcast_to(jnp.arange(W)[:, None], pid.shape).reshape(-1)
        H_cp = jnp.zeros((W, P, 6, 3)).at[w_rows, pid.reshape(-1)].add(
            jnp.einsum("w k i a, w k i b -> w k a b", Jc, Jp).reshape(-1, 6, 3))
        return jnp.sum(Hpp), jnp.sum(H_cp)

    print(f"run_lba (6 LM iters): {device_time_ms(f_run, prob):8.2f} ms")
    print(f"  assemble+solve    : {device_time_ms(f_asm, prob):8.2f} ms")
    print(f"  lba_cost          : {device_time_ms(f_cost, prob):8.2f} ms")
    print(f"  point_rj only     : {device_time_ms(f_rj, prob):8.2f} ms")
    print(f"  rj + MAD scale    : {device_time_ms(f_mad, prob):8.2f} ms")
    print(f"  rj + 2 scatters   : {device_time_ms(f_scatters, prob):8.2f} ms")


if __name__ == "__main__":
    main()
