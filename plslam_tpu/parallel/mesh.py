"""Device-mesh helpers for the distributed back-end.

The reference has no distributed layer (SURVEY.md §2.3) — this is the
new, TPU-native scaling story: a (kf, lm) mesh where keyframe blocks
ride one axis and landmark/residual blocks the other, with XLA
collectives (psum / all_gather / ppermute) over ICI doing the
Schur-complement reductions.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
    _SHMAP_STYLE = "new"
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
    _SHMAP_STYLE = "old"


def _factor_2d(n: int) -> Tuple[int, int]:
    """Split n devices into the most-square (a, b) grid with a*b = n."""
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def make_mesh(n_devices: int, axes: Sequence[str] = ("kf", "lm")) -> Mesh:
    devices = jax.devices()[:n_devices]
    if len(axes) == 1:
        shape = (n_devices,)
    elif len(axes) == 2:
        shape = _factor_2d(n_devices)
    else:
        raise ValueError("only 1D/2D meshes supported")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes))


def shard_map_fn(fn, mesh: Mesh, in_specs, out_specs, check: bool = True):
    """Version-portable shard_map wrapper.

    ``check=False`` disables the static replication checker (needed when
    outputs are made replicated by collectives like tiled all_gather,
    which the checker cannot always infer).
    """
    if check:
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
    for kw in ("check_vma", "check_rep"):
        try:
            return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, **{kw: False})
        except TypeError:
            continue
    return _shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def sharding(mesh: Mesh, spec: PartitionSpec) -> NamedSharding:
    return NamedSharding(mesh, spec)


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Multi-host bring-up (SURVEY.md §2.3 P6): ``jax.distributed
    .initialize`` with single-process passthrough.

    On a pod slice every host calls this before building meshes; the
    arguments default to the cluster-env auto-detection (GKE/Borg set
    the env vars). Returns the process index (0 on single host).
    Collectives then ride ICI within a slice and DCN across slices
    exactly as in the single-process CPU-mesh tests — the mesh/shard_map
    code in this package is identical either way.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_index()


def make_global_mesh(axes: Sequence[str] = ("kf", "lm")) -> Mesh:
    """Mesh over ALL addressable+remote devices (multi-host): the host
    axis folds into the first mesh axis so keyframe blocks shard across
    hosts (DCN) and landmark blocks across each host's chips (ICI)."""
    return make_mesh(len(jax.devices()), axes)
