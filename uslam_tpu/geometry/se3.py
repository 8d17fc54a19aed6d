"""SE(3) poses as (quaternion, translation) pytrees.

Replaces GTSAM ``Pose3`` (used throughout reference batch.py:128-136,166).
Tangent-vector convention follows GTSAM: ``xi = [omega(3), v(3)]`` — rotation
part first — so factor Jacobian blocks line up with the reference solver's
ordering (SURVEY.md §2.1 notes the reference's own DVL Jacobians violate this;
we use the correct convention).

Retraction is the full SE(3) exponential with *right* perturbation:
``retract(T, xi) = T * Exp(xi)`` — GTSAM's ``Pose3::retract`` under the
default ``GTSAM_POSE3_EXPMAP`` build.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from uslam_tpu.geometry.so3 import (
    quat_conjugate,
    quat_identity,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    so3_exp,
    so3_left_jacobian,
    so3_left_jacobian_inverse,
    so3_log,
)


class Pose3(NamedTuple):
    """Rigid transform: x_world = R(quat) @ x_local + trans.

    quat: (..., 4) [w,x,y,z]; trans: (..., 3).
    """

    quat: jnp.ndarray
    trans: jnp.ndarray


def pose_identity(dtype=jnp.float32) -> Pose3:
    return Pose3(quat_identity(dtype), jnp.zeros(3, dtype=dtype))


def pose_compose(a: Pose3, b: Pose3) -> Pose3:
    """a * b (apply b first, then a)."""
    return Pose3(
        quat_normalize(quat_multiply(a.quat, b.quat)),
        quat_rotate(a.quat, b.trans) + a.trans,
    )


def pose_inverse(p: Pose3) -> Pose3:
    qinv = quat_conjugate(p.quat)
    return Pose3(qinv, -quat_rotate(qinv, p.trans))


def pose_between(a: Pose3, b: Pose3) -> Pose3:
    """a^{-1} * b."""
    return pose_compose(pose_inverse(a), b)


def pose_transform_point(p: Pose3, x: jnp.ndarray) -> jnp.ndarray:
    """World point from local point: R x + t (GTSAM transformFrom)."""
    return quat_rotate(p.quat, x) + p.trans


def pose_transform_point_inverse(p: Pose3, x: jnp.ndarray) -> jnp.ndarray:
    """Local point from world point: R^T (x - t) (GTSAM transformTo).

    This is the camera-frame projection step the stereo factor needs
    (reference batch.py:300-305 via GTSAM GenericStereoFactor3D).
    """
    return quat_rotate(quat_conjugate(p.quat), x - p.trans)


def se3_exp(xi: jnp.ndarray) -> Pose3:
    """SE(3) exponential: xi = [omega, v] (…,6) -> Pose3.

    t = J_l(omega) @ v.
    """
    omega = xi[..., :3]
    v = xi[..., 3:]
    q = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(omega), v)
    return Pose3(q, t)


def se3_log(p: Pose3) -> jnp.ndarray:
    """SE(3) log: Pose3 -> xi = [omega, v] (…,6)."""
    omega = so3_log(p.quat)
    v = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inverse(omega), p.trans)
    return jnp.concatenate([omega, v], axis=-1)


def pose_retract(p: Pose3, xi: jnp.ndarray) -> Pose3:
    """Right retraction: p * Exp(xi)."""
    return pose_compose(p, se3_exp(xi))


def pose_local(a: Pose3, b: Pose3) -> jnp.ndarray:
    """Local coordinates of b in the chart at a: Log(a^{-1} b)."""
    return se3_log(pose_between(a, b))
