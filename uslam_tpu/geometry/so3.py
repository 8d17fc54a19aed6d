"""SO(3): quaternions, rotation matrices, exponential/log maps.

Pure functions over arrays; every function works under ``jit``/``vmap``/``grad``.
Quaternion layout is ``[w, x, y, z]`` — the argument order of the reference's
``Rot3.Quaternion(w, x, y, z)`` calls (reference batch.py:47,131).

Small-angle branches use ``jnp.where`` with Taylor expansions so gradients are
finite at theta = 0 (the double-where trick to avoid NaN cotangents).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, both [w,x,y,z]."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q: R(q) @ v.

    Uses the expanded form (2 cross products) — cheaper than building the
    matrix when rotating a single vector.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [w,x,y,z] -> 3x3 rotation matrix (batched)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion [w,x,y,z].

    Branch-free Shepperd method: compute all four candidate quaternions and
    select the one with the largest pivot (stable under jit/vmap).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the max.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS * _EPS))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Vector(s) (…,3) -> skew-symmetric matrix (…,3,3)."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))


def so3_vee(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _theta(w: jnp.ndarray):
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    return theta, theta_sq


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (…,3) -> unit quaternion (…,4).

    Taylor-safe at theta = 0 so jacfwd/jacrev at the identity are exact.
    """
    theta, theta_sq = _theta(w)
    half = 0.5 * theta
    small = theta_sq < _EPS
    # sin(t/2)/t with Taylor fallback: 1/2 - t^2/48.
    sinc_half = jnp.where(
        small,
        0.5 - theta_sq / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, theta),
    )
    cw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cw[..., None], sinc_half[..., None] * w], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Log map: unit quaternion (…,4) -> rotation vector (…,3)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # take shortest arc
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vn_sq = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1)
    vn = jnp.sqrt(jnp.maximum(vn_sq, 0.0))
    small = vn_sq < _EPS * _EPS
    angle = 2.0 * jnp.arctan2(vn, w)
    # scale = angle / vn, Taylor: 2/w * (1 - vn^2/(3 w^2))
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(w, _EPS) * (1.0 - vn_sq / (3.0 * jnp.maximum(w * w, _EPS))),
        angle / jnp.where(small, 1.0, vn),
    )
    return scale[..., None] * q[..., 1:]


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3) at rotation vector w, (…,3) -> (…,3,3).

    J_l = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2, W = hat(w).
    """
    theta, theta_sq = _theta(w)
    small = theta_sq < _EPS
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta_sq * theta),
    )
    W = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_left_jacobian_inverse(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3).

    J_l^{-1} = I - W/2 + (1/t^2 - (1+cos t)/(2 t sin t)) W^2.
    """
    theta, theta_sq = _theta(w)
    small = theta_sq < _EPS
    half = 0.5 * theta
    # c = 1/t^2 - cot(t/2)/(2 t); Taylor: 1/12 + t^2/720.
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / jnp.where(small, 1.0, theta_sq))
        - (jnp.cos(half) / jnp.where(small, 1.0, 2.0 * theta * jnp.sin(half))),
    )
    W = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot_term[..., None, None] * (W @ W)
