"""DVL body-frame velocity factor.

Replaces the reference's ``gtsam.CustomFactor`` over keys [V(t), X(t)]
(reference batch.py:241-250) whose error is

    e = R_world_body(X) @ v_meas_body - v_world(V)        (batch.py:221-228)

The reference hand-sets both Jacobians to ``rot_mat`` (batch.py:230-232),
which is the wrong sign for d(e)/dV (-I_3) and dimensionally wrong (3x3) for
the 6-dof pose — SURVEY.md §2.1. Here the residual is a pure function and the
solver gets exact Jacobians by AD, which is the *intended* math.
"""

from __future__ import annotations

import jax.numpy as jnp

from uslam_tpu.geometry.se3 import Pose3
from uslam_tpu.geometry.so3 import quat_rotate


def dvl_residual(
    pose: Pose3, vel: jnp.ndarray, meas_body: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    """Whitened 3-dim residual: (R @ v_meas - v) / sigma."""
    return (quat_rotate(pose.quat, meas_body) - vel) / sigma
