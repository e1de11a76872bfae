"""sift_tpu — a TPU-native SIFT / SfM framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the reference CUDA SIFT
(Cryptum169/another-cuda-sift): Gaussian/DoG pyramids, keypoint detection and
refinement, orientation assignment, 128-D descriptors, brute-force matching —
re-architected for TPU (static shapes, masked fixed-capacity keypoint sets,
MXU blur/resize operators, fused histogram reductions), plus multi-chip
scaling and a geometry/bundle-adjustment layer the reference lacks.
"""

from sift_tpu.config import SiftConfig
from sift_tpu.core.types import Keypoints, SiftResult, build_plan
from sift_tpu.pipeline.detector import SiftDetector, build_detect_fn
from sift_tpu.pipeline.matcher import match_brute_force, match_pairs

__version__ = "0.1.0"

__all__ = [
    "SiftConfig", "Keypoints", "SiftResult", "build_plan",
    "SiftDetector", "build_detect_fn",
    "match_brute_force", "match_pairs",
]
