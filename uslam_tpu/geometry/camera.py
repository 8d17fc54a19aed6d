"""Rectified stereo camera model — replaces GTSAM ``Cal3_S2Stereo`` +
``StereoCamera`` (reference batch.py:110-118,300-305).

Measurement convention matches GTSAM ``StereoPoint2``: ``(uL, uR, v)`` with a
shared row ``v`` (rectified pair). The back-projection replicates the
reference's hand-rolled triangulation in ``get_landmarks``
(reference batch.py:152-163), including its use of the mean focal length
``f = (fx+fy)/2`` for the z coordinate (batch.py:112,162).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import CameraConfig
from uslam_tpu.geometry.se3 import Pose3, pose_transform_point, pose_transform_point_inverse


class StereoCamera(NamedTuple):
    """Calibration as arrays so it can ride through jit boundaries."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    baseline: jnp.ndarray

    @classmethod
    def from_config(cls, cfg: CameraConfig, dtype=jnp.float32) -> "StereoCamera":
        return cls(
            jnp.asarray(cfg.fx, dtype),
            jnp.asarray(cfg.fy, dtype),
            jnp.asarray(cfg.cx, dtype),
            jnp.asarray(cfg.cy, dtype),
            jnp.asarray(cfg.baseline, dtype),
        )


def stereo_project(cam: StereoCamera, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame point(s) (…,3) -> StereoPoint2 (…,3) = (uL, uR, v).

    uL = fx x/z + cx;  uR = fx (x - b)/z + cx;  v = fy y/z + cy.
    Matches GTSAM StereoCamera::project used by GenericStereoFactor3D
    (reference batch.py:300).
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uL = cam.fx * x / z_safe + cam.cx
    uR = cam.fx * (x - cam.baseline) / z_safe + cam.cx
    v = cam.fy * y / z_safe + cam.cy
    return jnp.stack([uL, uR, v], axis=-1)


def stereo_backproject(cam: StereoCamera, meas: jnp.ndarray) -> jnp.ndarray:
    """StereoPoint2 (…,3) = (uL, uR, v) -> camera-frame point (…,3).

    Replicates reference batch.py:156-163 *semantics*: disparity d = uR - uL
    (negative for points in front of the camera under the projection above),
    W = d / baseline, then

        x = (uL - cx) / W,  y = (v - cy) / W,  z = f_mean / W

    The reference divides pixel offsets by W = d/b, i.e. scales by b/d, which
    reconstructs depth up to the fx/fy mix it glosses over; we keep the exact
    formula for pose-output parity and fix only the sign convention via the
    caller (the reference's normalized features give uR > uL; GTSAM's give
    uL > uR). Here we use magnitudes so both work.
    """
    uL, uR, v = meas[..., 0], meas[..., 1], meas[..., 2]
    d = jnp.abs(uR - uL)
    d_safe = jnp.maximum(d, 1e-6)
    W = d_safe / cam.baseline
    x = (uL - cam.cx) / W
    y = (v - cam.cy) / W
    f_mean = 0.5 * (cam.fx + cam.fy)
    z = f_mean / W
    return jnp.stack([x, y, z], axis=-1)


def triangulate_stereo(
    cam: StereoCamera, cam_pose_world: Pose3, meas: jnp.ndarray
) -> jnp.ndarray:
    """Back-project stereo measurement(s) and move to world frame.

    ``cam_pose_world`` is the camera pose in the world (world_T_cam); the
    reference instead keeps cam_T_world ("zed <- world" lookup,
    batch.py:45-48) and applies R p + t directly (batch.py:166) — same
    operation, different bookkeeping.
    """
    p_cam = stereo_backproject(cam, meas)
    return pose_transform_point(cam_pose_world, p_cam)


def quat_to_matrix_np(q: np.ndarray) -> np.ndarray:
    """(…, 4) wxyz -> (…, 3, 3), plain numpy (ingest-time host math)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), np.float64)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def triangulate_stereo_np(cam_cfg, quats, trans, meas) -> np.ndarray:
    """Vectorized numpy :func:`triangulate_stereo` over (F,) measurements.

    The ingest path is host-side work; keeping it in numpy avoids paying an
    XLA compile per process (this host's CPU compile cache doesn't reload)
    or a TPU-tunnel round trip. Same math as the jit version (tested).
    ``cam_cfg``: CameraConfig; quats (F, 4) wxyz; trans (F, 3); meas (F, 3).
    """
    meas = np.asarray(meas, np.float64)
    uL, uR, v = meas[..., 0], meas[..., 1], meas[..., 2]
    d = np.maximum(np.abs(uR - uL), 1e-6)
    W = d / cam_cfg.baseline
    p_cam = np.stack(
        [
            (uL - cam_cfg.cx) / W,
            (v - cam_cfg.cy) / W,
            (0.5 * (cam_cfg.fx + cam_cfg.fy)) / W,
        ],
        axis=-1,
    )
    R = quat_to_matrix_np(np.asarray(quats, np.float64))
    return np.einsum("...ij,...j->...i", R, p_cam) + np.asarray(trans, np.float64)


def normalized_to_pixels(
    u0: jnp.ndarray,
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    resolution_x: float,
    resolution_y: float,
) -> jnp.ndarray:
    """De-normalize front-end features from [-1, 1] to pixels.

    Exactly reference batch.py:152-154:
        uL = (u0 + 1) * 0.5 * res_x
        uR = (u1 + 1) * 0.5 * res_x
        v  = ((v0 + v1)/2 + 1) * 0.5 * res_y
    Returns stacked (…, 3) = (uL, uR, v).
    """
    uL = (u0 + 1.0) * 0.5 * resolution_x
    uR = (u1 + 1.0) * 0.5 * resolution_x
    v = ((v0 + v1) / 2.0 + 1.0) * 0.5 * resolution_y
    return jnp.stack([uL, uR, v], axis=-1)


def project_world_point(
    cam: StereoCamera, pose_world_body: Pose3, p_world: jnp.ndarray
) -> jnp.ndarray:
    """Project a world point through a body/camera pose: the stereo factor's
    forward model (GenericStereoFactor3D semantics, reference batch.py:300-305
    with identity body_P_sensor)."""
    p_cam = pose_transform_point_inverse(pose_world_body, p_world)
    return stereo_project(cam, p_cam)
