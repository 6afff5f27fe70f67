"""Device-time measurement via profiler traces.

On this platform block_until_ready can return before device completion
(axon tunnel), so wall-clock micro-benchmarks under-report. The honest
measurement is the profiler's device timeline: run the function N times
under a trace and sum the jit executable's device duration.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

import jax


def device_time_ms(fn, *args, iters: int = 5, warmup: int = 1):
    """Mean device-side executable time (ms) of one call to jitted fn."""
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    tmp = tempfile.mkdtemp(prefix="devtime_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
    files = sorted(glob.glob(os.path.join(
        tmp, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        return float("nan")
    with gzip.open(files[-1]) as fh:
        t = json.load(fh)
    total = 0.0
    for e in t["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and (e["name"].startswith("jit_") or
                     e["name"].startswith("jit__"))):
            total += e["dur"]
    return total / 1000.0 / iters


def kernel_breakdown_ms(fn, *args, iters: int = 3, top: int = 15):
    """Top device kernels (name, total ms over iters)."""
    r = fn(*args)
    jax.block_until_ready(r)
    tmp = tempfile.mkdtemp(prefix="devtime_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
    files = sorted(glob.glob(os.path.join(
        tmp, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as fh:
        t = json.load(fh)
    durs = collections.Counter()
    for e in t["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and not e["name"].startswith("$")
                and not e["name"].startswith("jit")
                and not e["name"].startswith("Pjit")):
            durs[e["name"][:70]] += e["dur"]
    return [(n, d / 1000.0 / iters) for n, d in durs.most_common(top)]
