import os
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/plslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.stereo_frame import extract_stereo_frame

cfg = SlamConfig()
cam = StereoCamera.from_config(cfg.camera)
H, W = cfg.camera.height, cfg.camera.width
il = jnp.zeros((20, H, W), jnp.float32)
fn = jax.jit(jax.vmap(lambda a, b: extract_stereo_frame(a, b, cam, cfg)))
txt = fn.lower(il, il).compile().as_text()
open("/tmp/extract.hlo", "w").write(txt)
print(len(txt), "bytes")
