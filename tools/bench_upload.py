"""Microbenchmark: host<->device transfer behavior of this rig's tunnel.

Documents the H2D degradation that shaped the ingest design (see
BASELINE.md "tunnel H2D degradation" and backend/fused_slam.py):

  * before any device fetch, jax.device_put runs at ~1.5 GB/s;
  * after the FIRST device_get (any size, even a scalar), every
    subsequent put in the process runs at ~35 MB/s, permanently —
    per-byte, not per-call, and parallel puts don't help;
  * copy_to_host_async poisons the same way; block_until_ready alone
    does not.

Run on a healthy tunnel to reproduce. Not part of the test suite.
"""
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax

    rng = np.random.default_rng(0)

    def put(arr, label):
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt*1e3:8.1f} ms ({arr.nbytes/1e6/dt:7.1f} MB/s)")
        return d

    big = rng.integers(0, 255, (18 * 1024 * 1024,), dtype=np.uint8)
    put(big, "warmup put 18 MB      ")
    for _ in range(3):
        put(big, "pre-fetch put 18 MB   ")

    # concurrency before poisoning
    pool = ThreadPoolExecutor(4)
    parts = np.array_split(big, 4)
    t0 = time.perf_counter()
    refs = [f.result() for f in [pool.submit(jax.device_put, p)
                                 for p in parts]]
    jax.block_until_ready(refs)
    print(f"pre-fetch 4-way put    : {1e3*(time.perf_counter()-t0):8.1f} ms")

    print("-- one device_get of a 4-float array --")
    small = jax.jit(lambda x: x + 1)(jax.numpy.zeros((4,)))
    _ = jax.device_get(small)

    for _ in range(3):
        put(big, "POST-fetch put 18 MB  ")
    t0 = time.perf_counter()
    refs = [f.result() for f in [pool.submit(jax.device_put, p)
                                 for p in parts]]
    jax.block_until_ready(refs)
    print(f"post-fetch 4-way put   : {1e3*(time.perf_counter()-t0):8.1f} ms")
    pool.shutdown()


if __name__ == "__main__":
    main()
