"""Stereo projection factor.

Replaces GTSAM ``GenericStereoFactor3D(StereoPoint2(uL, uR, v), noise,
X(i), L(id), K)`` (reference batch.py:300-305) with a pure residual:

    r = project(world_T_body^{-1} @ l_world) - (uL, uR, v)

whitened by the isotropic sigma (10 px in the reference, batch.py:118).
The body->sensor transform is identity, as in the reference (no
``body_P_sensor`` argument at batch.py:300).
"""

from __future__ import annotations

import jax.numpy as jnp

from uslam_tpu.geometry.camera import StereoCamera, project_world_point
from uslam_tpu.geometry.se3 import Pose3


def stereo_residual(
    cam: StereoCamera,
    pose: Pose3,
    landmark: jnp.ndarray,
    meas: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Whitened 3-dim residual (uL, uR, v)."""
    return (project_world_point(cam, pose, landmark) - meas) / sigma
