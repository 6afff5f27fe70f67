import os
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/plslam_tpu_xla"))
from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.backend.fused_slam import make_fused_slam_step, init_crit_carry
from plslam_tpu.backend.map import init_map_state
from plslam_tpu.tracking.batch_vo import extract_one
from plslam_tpu.loop.loop_closer import LoopCloser

cfg = SlamConfig()
cam = StereoCamera.from_config(cfg.camera)
lc = LoopCloser(cfg, cam)
step = make_fused_slam_step(cam, cfg, cfg.system.kf_batch, lc.db.voc_p, lc.db.voc_l)
imgs = jnp.zeros((2, 20, cfg.camera.height, cfg.camera.width), jnp.uint8)
pts, lns = extract_one(jnp.zeros((cfg.camera.height, cfg.camera.width)),
                       jnp.zeros((cfg.camera.height, cfg.camera.width)), cam, cfg)
state = init_map_state(cfg)
bows_p = lc.db.bows_p; bows_l = lc.db.bows_l
txt = step.lower(imgs, pts, lns, jnp.eye(4), init_crit_carry(), state,
                 bows_p, bows_l).compile().as_text()
open("/tmp/fused_hlo.txt", "w").write(txt)
print(len(txt))
