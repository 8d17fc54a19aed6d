"""Prior factors on the first pose, velocity and (optionally) IMU bias.

Reference adds ``PriorFactorPose3(X(0), pose, sigmas=[0.1 x3, 0.3 x3])`` and
``PriorFactorVector(V(0), 0, sigma=0.1)`` (batch.py:281-282). The bias B(0)
gets an initial value but *no* prior in the reference (batch.py:274) — here a
bias prior is available and configurable (SURVEY.md §2.1 recommends keeping
it) since the bias is otherwise only weakly constrained through IMU factors.
"""

from __future__ import annotations

import jax.numpy as jnp

from uslam_tpu.geometry.se3 import Pose3, pose_local


def prior_pose_residual(
    pose: Pose3, prior: Pose3, sigmas: jnp.ndarray
) -> jnp.ndarray:
    """6-dim whitened residual: Log(prior^{-1} pose) / sigmas.

    GTSAM PriorFactor error = Local(prior, x); sigmas ordered
    [rot(3), trans(3)] matching the reference's Diagonal::Sigmas argument
    (batch.py:95)."""
    return pose_local(prior, pose) / sigmas


def prior_vel_residual(
    vel: jnp.ndarray, prior: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    return (vel - prior) / sigma


def prior_bias_residual(
    bias: jnp.ndarray, prior: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    return (bias - prior) / sigma
