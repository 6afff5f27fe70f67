"""REAL multi-process jax.distributed test (VERDICT round-1 item 6 /
SURVEY.md §7.1 step 8): two OS processes, each with 2 virtual CPU
devices, joined by jax.distributed over localhost — the pod bring-up
path (init_multihost + global mesh + cross-process collectives) that
the single-process 8-device simulation never exercises. The result must
equal a single-process run of the same landmark-sharded step."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dist_lba_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)     # workers set their own device count
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "plslam_tpu.parallel.multihost_check",
             "--rank", str(r), "--nprocs", "2", "--port", str(port),
             "--out", str(tmp_path), "--local-devices", "2"],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{o[-3000:]}"
    z = np.load(tmp_path / "rank0.npz")
    assert int(z["n_devices"]) == 4      # 2 processes x 2 devices

    # single-process reference: same step on a local 4-device mesh
    from plslam_tpu.parallel.mesh import make_mesh
    from plslam_tpu.parallel.dist_lba import (bucket_problem_by_owner,
                                              make_dist_lba_step,
                                              unbucket_landmarks)
    from plslam_tpu.parallel.multihost_check import make_problem
    from plslam_tpu.config import CameraConfig
    from plslam_tpu.core.camera import StereoCamera
    import jax.numpy as jnp

    cam = StereoCamera.from_config(CameraConfig(
        width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        baseline=0.4))
    mesh = make_mesh(4, axes=("lm",))
    step = make_dist_lba_step(mesh, cam)
    b = bucket_problem_by_owner(make_problem(), 4)
    dxi, d_pt, d_ep = step(b.problem, jnp.asarray(1e-3))
    d_pt = unbucket_landmarks(d_pt, b.pt_perm)
    d_ep = unbucket_landmarks(d_ep, b.ep_perm)
    # equal up to f32 collective-reduction-order noise
    np.testing.assert_allclose(z["dxi"], np.asarray(dxi),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(z["d_pt"], np.asarray(d_pt),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(z["d_ep"], np.asarray(d_ep),
                               rtol=1e-3, atol=1e-4)
    # and non-trivial: the step actually moved the state
    assert float(np.abs(z["dxi"]).max()) > 1e-4
    assert float(np.abs(z["d_pt"]).max()) > 1e-4
