"""plslam_tpu — a TPU-native stereo point-line SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rubengooj/pl-slam (+ its VO library rubengooj/stvo-pl): stereo visual
odometry with ORB-style point features and LSD/LBD-style line-segment
features, robust Gauss-Newton frame-to-frame tracking, keyframe-based
local bundle adjustment, DBoW2-style binary-vocabulary loop closure and
SE(3) pose-graph optimization — all as fixed-shape, batched, jittable
array programs that scale across a TPU mesh via shard_map collectives.

Reference parity map (upstream component -> module here):
  stvo-pl/src/auxiliar.cpp            -> plslam_tpu.core.lie / core.robust
  stvo-pl/src/pinholeStereoCamera.cpp -> plslam_tpu.core.camera
  stvo-pl/src/config.cpp              -> plslam_tpu.config
  stvo-pl/src/dataset.cpp             -> plslam_tpu.io.dataset
  stvo-pl/src/stereoFrame.cpp         -> plslam_tpu.frontend.stereo_frame
  stvo-pl/src/stereoFeatures.h        -> plslam_tpu.frontend.features
  stvo-pl/src/matching.cpp            -> plslam_tpu.ops.hamming
  stvo-pl/src/gridStructure.cpp       -> ops.hamming.window_mask +
                                         ops.fast.select_topk_grid
  stvo-pl/src/stereoFrameHandler.cpp  -> plslam_tpu.tracking.frame_handler
                                         / tracking.pose_gn
  3rdparty/line_descriptor (LSD/LBD)  -> plslam_tpu.ops.lines / ops.lbd
  pl-slam/src/mapHandler.cpp          -> plslam_tpu.backend.map /
                                         backend.map_handler / backend.lba
                                         / backend.chunk_backend
  pl-slam/src/mapFeatures.cpp         -> plslam_tpu.backend.map (landmark
                                         arrays, medoid descriptors,
                                         view-direction gating)
  pl-slam/src/keyFrame.cpp            -> KF slots in backend.map.MapState
  3rdparty/DBoW2                      -> plslam_tpu.loop.vocabulary / loop.database
  g2o pose graph                      -> plslam_tpu.loop.pose_graph
  app/plslam_dataset.cpp              -> plslam_tpu.apps.plslam_dataset
  app/plstvo_dataset.cpp              -> plslam_tpu.apps.plstvo_dataset
  (new, no reference equivalent)      -> plslam_tpu.parallel (owner-sharded
                                         distributed BA, multi-host bring-up,
                                         sharded vocabulary retrieval),
                                         apps.plslam_multiseq (concurrent
                                         sessions), backend.checkpoint
"""

__version__ = "0.1.0"
