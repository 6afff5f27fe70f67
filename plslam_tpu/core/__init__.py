from plslam_tpu.core import lie, camera, robust  # noqa: F401
