"""Differentiable SO(3)/SE(3) geometry and the stereo camera model.

Replaces the GTSAM geometry types the reference leans on
(``Rot3``/``Pose3``/``Point3``/``Cal3_S2Stereo``, reference batch.py:19-26)
with pure-functional, jit/vmap-friendly array code. Quaternions are stored
``[w, x, y, z]`` (GTSAM ``Rot3.Quaternion`` argument order, batch.py:131).
"""

from uslam_tpu.geometry.so3 import (  # noqa: F401
    quat_identity,
    quat_multiply,
    quat_conjugate,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    so3_exp,
    so3_log,
    so3_hat,
    so3_vee,
    so3_left_jacobian,
    so3_left_jacobian_inverse,
)
from uslam_tpu.geometry.se3 import (  # noqa: F401
    Pose3,
    pose_identity,
    pose_compose,
    pose_inverse,
    pose_between,
    pose_transform_point,
    pose_transform_point_inverse,
    se3_exp,
    se3_log,
    pose_retract,
    pose_local,
)
from uslam_tpu.geometry.camera import (  # noqa: F401
    StereoCamera,
    stereo_project,
    stereo_backproject,
    triangulate_stereo,
    normalized_to_pixels,
    project_world_point,
)
