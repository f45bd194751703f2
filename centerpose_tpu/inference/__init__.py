from centerpose_tpu.inference.detector import Detector  # noqa: F401
from centerpose_tpu.inference.post_process import multi_pose_post_process  # noqa: F401
