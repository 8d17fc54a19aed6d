"""ORB visual front-end — batched TPU kernels.

Replaces the external OpenCV ``gtsam_vio/ImageProcessorNodelet``
(reference launch/stereo.launch:33-47): grid-limited FAST detection with
Harris scoring, intensity-centroid orientation, rBRIEF descriptors, and
brute-force Hamming stereo + temporal matching (the north-star design
replaces the nodelet's KLT tracking with ORB matching — BASELINE.json).

Every stage is a pure jit/vmap function over static-shape arrays; the
per-frame track-id bookkeeping (the only inherently dynamic part) lives
host-side in :mod:`tracker`. Pallas TPU kernels for the hot ops live in
:mod:`pallas_kernels` with pure-XLA references used as oracles.
"""

from uslam_tpu.frontend.pyramid import build_pyramid, box_blur  # noqa: F401
from uslam_tpu.frontend.fast import fast_corners, harris_response  # noqa: F401
from uslam_tpu.frontend.orb import Keypoints, extract_orb  # noqa: F401
from uslam_tpu.frontend.match import (  # noqa: F401
    hamming_distance_matrix,
    match_descriptors,
    stereo_match,
)
from uslam_tpu.frontend.tracker import StereoFrontend  # noqa: F401
