"""Map checkpoint/resume.

The reference has NO persistence (SURVEY.md §5: map lives in RAM, only
the trajectory is written at exit). Because the whole map here is a
pytree of arrays, checkpointing is trivial — an npz snapshot of the
MapState plus the config — and a SLAM run can resume from it
(restartability the reference lacks).
"""

from __future__ import annotations

import json
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from plslam_tpu.backend.map import MapState
from plslam_tpu.config import SlamConfig


def save_map(path: str, state: MapState, cfg: SlamConfig,
             extra: dict = None) -> None:
    arrays = {f"state_{name}": np.asarray(v)
              for name, v in zip(MapState._fields, state)}
    arrays["config_json"] = np.frombuffer(
        json.dumps(cfg.to_dict()).encode(), dtype=np.uint8)
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> Tuple[MapState, SlamConfig, dict]:
    z = np.load(path)
    cfg = SlamConfig().with_updates(
        json.loads(bytes(z["config_json"]).decode()))
    state = MapState(*[jnp.asarray(z[f"state_{name}"])
                       for name in MapState._fields])
    extra = {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}
    return state, cfg, extra
