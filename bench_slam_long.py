"""Endurance full-SLAM benchmark at reference scale (KITTI-00 class).

The reference's canonical workload is KITTI 00 — 4,541 frames, ~1k
keyframes, repeated loop closures over a city circuit (SURVEY §6;
``pl-slam/app/plslam_dataset.cpp``). This rig has no datasets, so the
equivalent endurance workload is synthesized: a constant-screw circular
circuit at KITTI resolution whose discrete lap closes EXACTLY (the
product of identical screws with total yaw 2*pi is the identity), so
the camera revisits the identical viewpoints every lap. LAPS laps of
LAP frames drive the engine through

  * > mapping.max_kfs keyframes -> slot compaction, pressure eviction,
    and the eviction telemetry all fire in one run;
  * a revisit event per lap -> repeated loop closures + pose-graph
    solves at 512-slot bucketing (the PCG solver past the dense wall);
  * a trajectory long enough that host-side bookkeeping (anchors,
    edges, voter) is exercised at production scale.

Because laps are exactly periodic, only ONE lap is rendered and staged
on device (bounding host RAM and avoiding the tunnel's post-fetch H2D
collapse — see bench_slam.py); every lap replays the same device
chunks. The timed region is identical in kind to bench_slam.py.

Prints ONE JSON line; recorded next to BENCH_r*.json as the
reference-scale evidence (round-4 verdict item 1).

Env knobs: LAPS (5), LAP_FRAMES (800), PLSLAM_BENCH_CHUNK (20),
PLSLAM_LONG_STEP (0.3 m/frame), PLSLAM_LONG_MINENT
(keyframe.min_entropy_ratio), PLSLAM_LONG_MAXKFS (mapping.max_kfs —
e.g. 1024 for the provisioned configuration), PLSLAM_LONG_SOLVER
(pose-graph solver override), PLSLAM_LONG_LCTRS (lc_trs override),
WARM_LAPS (2), PLSLAM_LONG_DEBUG (npz dump path), PLSLAM_LC_DEBUG
(staged closure application with per-stage magnitude checks).
The recorded BENCH_LONG_r05.json pair used: LAPS=10 LAP_FRAMES=400
PLSLAM_LONG_MINENT=0.89 [PLSLAM_LONG_MAXKFS=1024].
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/plslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from plslam_tpu.backend.fused_slam import FusedPLSLAM
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.utils.evaluation import ate_rmse

    laps = int(os.environ.get("LAPS", "5"))
    lap = int(os.environ.get("LAP_FRAMES", "800"))
    chunk = int(os.environ.get("PLSLAM_BENCH_CHUNK", "20"))
    step = float(os.environ.get("PLSLAM_LONG_STEP", "0.3"))
    assert lap % chunk == 0, "lap must be a whole number of chunks"

    cfg = SlamConfig()
    if os.environ.get("PLSLAM_LONG_MINENT"):
        cfg = cfg.with_updates({"keyframe": {
            "min_entropy_ratio": float(os.environ["PLSLAM_LONG_MINENT"])}})
    # loop.lc_trs stays at the config default: an experiment that
    # raised it to 5 m (reasoning the funnel's rej_corr counts were
    # good corrections) diverged catastrophically — the magnitude gate
    # is what keeps an occasional bad verified candidate from warping
    # the whole graph, exactly its reference role. Env override for
    # experiments only.
    if os.environ.get("PLSLAM_LONG_LCTRS"):
        cfg = cfg.with_updates({"loop": {
            "lc_trs": float(os.environ["PLSLAM_LONG_LCTRS"])}})
    if os.environ.get("PLSLAM_LONG_SOLVER"):
        cfg = cfg.with_updates({"loop": {
            "pose_graph_solver": os.environ["PLSLAM_LONG_SOLVER"]}})
    if os.environ.get("PLSLAM_LONG_MAXKFS"):
        # provisioned variant: capacity sized for the sequence (the
        # config the eviction warning tells a user to run)
        cfg = cfg.with_updates({"mapping": {
            "max_kfs": int(os.environ["PLSLAM_LONG_MAXKFS"])}})
    cam = StereoCamera.from_config(cfg.camera)

    # ---- exactly-periodic circuit + world around the camera path --------
    yaw = 2.0 * np.pi / lap          # step defaults to KITTI-like speed
    xi = np.array([0, 0, step, 0, yaw, 0], np.float32)
    T, lap_poses = np.eye(4, dtype=np.float32), []
    S = synthetic._exp_se3_np(xi)
    for _ in range(lap):
        lap_poses.append(T)
        T = (T @ S).astype(np.float32)
    lap_poses = np.stack(lap_poses)                     # (lap, 4, 4)
    poses = np.concatenate([lap_poses] * laps + [lap_poses[:1]])
    center = lap_poses[:, :3, 3].mean(0)

    # ring of structure AROUND the circuit (the 201-frame bench's world
    # density, scaled to the ~120 m circumference)
    rng = np.random.default_rng(7)
    n_pts, n_lns = 1600, 240
    R_cam = float(np.linalg.norm(lap_poses[0, :3, 3] - center))
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    rad = rng.uniform(max(R_cam - 12.0, 2.0), R_cam + 14.0, n_pts)
    pts = np.stack([center[0] + rad * np.sin(ang),
                    rng.uniform(-3.5, 3.5, n_pts),
                    center[2] + rad * np.cos(ang)], -1).astype(np.float32)
    angl = rng.uniform(0, 2 * np.pi, n_lns)
    radl = rng.uniform(max(R_cam - 12.0, 2.0), R_cam + 14.0, n_lns)
    sp = np.stack([center[0] + radl * np.sin(angl),
                   rng.uniform(-3.5, 3.5, n_lns),
                   center[2] + radl * np.cos(angl)], -1).astype(np.float32)
    d = rng.normal(size=(n_lns, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ep = (sp + d * rng.uniform(1.0, 4.0, (n_lns, 1))).astype(np.float32)
    world = synthetic.SyntheticWorld(
        pts, sp, ep, rng.integers(0, 2**31 - 1, n_pts))

    # ---- render ONE lap, pack to u8 --------------------------------------
    t_r = time.time()
    u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    il = np.empty((lap, cam.height, cam.width), np.uint8)
    ir = np.empty_like(il)
    for i in range(lap):
        l_, r_ = synthetic.render_frame(world, lap_poses[i], cam, rng,
                                        noise=0.004)
        il[i], ir[i] = u8(l_), u8(r_)
    print(f"[bench_slam_long] rendered {lap}-frame lap in "
          f"{time.time() - t_r:.0f}s", file=sys.stderr)

    # ---- pre-stage the lap's chunks on device (pre-poison H2D) ----------
    # chunk starting at global frame g covers lap indices
    # [(g-1) % lap + 1 .. +chunk], wrapping to index 0 at the lap seam
    def lap_chunk(off):                     # off = (g - 1) % lap
        idx = (np.arange(off + 1, off + 1 + chunk)) % lap
        return np.stack([il[idx], ir[idx]])

    offsets = list(range(0, lap, chunk))
    dev_chunks = {off: jax.device_put(lap_chunk(off)) for off in offsets}
    jax.block_until_ready(list(dev_chunks.values()))

    # ---- warmup: 2 laps with a throwaway driver so the loop-closure
    # programs (verification, pose graph, post-loop update) compile
    # OUTSIDE the timed region — the short bench amortizes these over
    # its in-process warmup pass; without this the first revisit's
    # compiles (~60 s) land inside the timed run and measure the
    # compiler, not the engine. (The persistent XLA cache makes repeat
    # invocations warm even across processes.)
    warm_laps = int(os.environ.get("WARM_LAPS", "2"))
    if warm_laps:
        w = FusedPLSLAM(cfg, cam)
        w.initialize(il[0], ir[0])
        for g in range(1, warm_laps * lap + 1, chunk):
            w.process_chunk(dev_chunks[(g - 1) % lap])
        w.finish()
        w.close()
        print(f"[bench_slam_long] warmup: {warm_laps} laps, "
              f"{w.loop_closer.n_loops_closed} loops", file=sys.stderr)

    # ---- run --------------------------------------------------------------
    n = laps * lap + 1
    slam = FusedPLSLAM(cfg, cam)
    slam.initialize(il[0], ir[0])
    t0 = None
    for g in range(1, n, chunk):
        slam.process_chunk(dev_chunks[(g - 1) % lap])
        if t0 is None:
            t0 = time.perf_counter()        # first chunk absorbs compiles
    est = slam.finish()
    wall = time.perf_counter() - t0
    n_timed = n - 1 - chunk
    fps = n_timed / wall

    ate = float(ate_rmse(est, poses[:len(est)]))
    # per-lap ATE of the GLOBALLY aligned trajectory: the band must hold
    # across compaction/eviction events (no cliff at the slot ceiling)
    from plslam_tpu.utils.evaluation import umeyama_alignment
    p_est, p_gt = est[:, :3, 3], poses[:len(est), :3, 3]
    Ra, ta, _ = umeyama_alignment(p_est, p_gt)
    err = np.linalg.norm(p_est @ Ra.T + ta - p_gt, axis=-1)
    ate_lap = [round(float(np.sqrt((err[k * lap:(k + 1) * lap] ** 2
                                    ).mean())), 4)
               for k in range(laps)]
    # per-lap SHAPE error (each lap aligned on its own): separates
    # "locally consistent but globally drifted" from "shape broken" —
    # the band that must hold across compaction/eviction events
    ate_lap_shape = [round(float(ate_rmse(est[k * lap:(k + 1) * lap],
                                          poses[k * lap:(k + 1) * lap])),
                           4) for k in range(laps)]

    lc = slam.loop_closer
    if os.environ.get("PLSLAM_LONG_DEBUG"):
        np.savez(os.environ["PLSLAM_LONG_DEBUG"],
                 est=est, gt=poses[:len(est)],
                 kf_poses=slam.kf_poses(),
                 anchor_slots=np.asarray(
                     [s for s, _ in slam._frame_anchor], np.int32),
                 anchor_T=np.stack([T for _, T in slam._frame_anchor]),
                 evict_frames=np.asarray(
                     [f for f, _ in slam.eviction_events], np.int32),
                 evict_slots=np.asarray(sum(
                     [s for _, s in slam.eviction_events], []), np.int32),
                 loop_pairs=np.asarray(
                     [(e.kf_from, e.kf_to) for e in lc.events], np.int32
                     ).reshape(-1, 2),
                 loop_corr_t=np.asarray(
                     [e.correction_t for e in lc.events], np.float32),
                 odo_edges=np.asarray([(i, j) for i, j, _, _ in
                                       lc.odo_edges], np.int32
                                      ).reshape(-1, 2),
                 loop_edges=np.asarray([(i, j) for i, j, _, _ in
                                        lc.loop_edges], np.int32
                                       ).reshape(-1, 2),
                 covis_edges=np.asarray([(i, j) for i, j, _, _, _ in
                                         lc.covis_edges], np.int32
                                        ).reshape(-1, 2))
    out = {"metric": "slam_long_frames_per_sec_chip",
           "value": round(fps, 2), "unit": "fps",
           "frames": n, "kfs_final": slam._kf_slot + 1,
           "kfs_inserted": len(slam.summaries) + 1,
           "loops": lc.n_loops_closed if lc else 0,
           "ate_rmse_m": round(ate, 4),
           "ate_per_lap_m": ate_lap,
           "ate_per_lap_shape_m": ate_lap_shape,
           "n_compactions": slam.n_compactions,
           "n_evictions": len(slam.eviction_events),
           "evicted_kfs": slam.n_evicted_kfs,
           "kf_deferral_chunks": slam.n_kf_deferral_chunks,
           "edges_dropped": lc.n_edges_dropped if lc else 0,
           "loop_funnel": {"candidates": lc.n_candidates,
                           "votes_fired": lc.n_votes_fired,
                           "rej_geom": lc.n_rej_geom,
                           "rej_unc": lc.n_rej_unc,
                           "rej_corr": lc.n_rej_corr} if lc else None,
           "vs_baseline": round(fps / 22.5, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("PLSLAM_BENCH_INNER"):
        main()
    else:
        from bench import run_guarded
        ok = run_guarded(os.path.abspath(__file__), timeout=3600.0,
                         label="bench_slam_long")
        sys.exit(0 if ok else 1)
