"""Linearization: whitened residuals + exact tangent-space Jacobians.

This is GTSAM's ``NonlinearFactorGraph::linearize`` re-imagined for SPMD
hardware: instead of a heterogeneous list of factor objects each producing a
small ``JacobianFactor``, every factor *family* linearizes as one vmapped
call producing stacked residuals and dense Jacobian blocks. Masked entries
(padding) produce exactly zero rows so they contribute nothing to the normal
equations (SURVEY.md §7 'Schur correctness with masking').

Jacobians are computed by forward-mode AD of the residual as a function of a
tangent perturbation at the linearization point — correct by construction
(unlike the reference's hand-set DVL Jacobians, batch.py:230-232).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uslam_tpu.factors.dvl import dvl_residual
from uslam_tpu.factors.imu import ImuIntervalData, imu_residual
from uslam_tpu.factors.priors import (
    prior_bias_residual,
    prior_pose_residual,
    prior_vel_residual,
)
from uslam_tpu.factors.stereo import stereo_residual
from uslam_tpu.geometry.camera import StereoCamera
from uslam_tpu.geometry.se3 import Pose3, pose_local, pose_retract
from uslam_tpu.graph.builder import GraphArrays
from uslam_tpu.graph.values import Values


class Linearization(NamedTuple):
    """All whitened residuals and Jacobian blocks, stacked per factor family.

    Shapes: N poses, F stereo observations; i/j index the two frames an IMU
    interval couples (j = i+1)."""

    prior_pose_r: jnp.ndarray   # (6,)
    prior_pose_J: jnp.ndarray   # (6, 6)
    prior_vel_r: jnp.ndarray    # (3,)
    prior_vel_J: jnp.ndarray    # (3, 3)
    prior_bias_r: jnp.ndarray   # (6,)
    prior_bias_J: jnp.ndarray   # (6, 6)
    marg_r: jnp.ndarray         # (15,) dense marginal prior (fixed-lag)
    marg_J: jnp.ndarray         # (15, 15) wrt [pose_0, vel_0, bias]
    imu_r: jnp.ndarray          # (N-1, 9)
    imu_J_pose_i: jnp.ndarray   # (N-1, 9, 6)
    imu_J_vel_i: jnp.ndarray    # (N-1, 9, 3)
    imu_J_pose_j: jnp.ndarray   # (N-1, 9, 6)
    imu_J_vel_j: jnp.ndarray    # (N-1, 9, 3)
    imu_J_bias: jnp.ndarray     # (N-1, 9, 6)
    dvl_r: jnp.ndarray          # (N, 3)
    dvl_J_pose: jnp.ndarray     # (N, 3, 6)
    dvl_J_vel: jnp.ndarray      # (N, 3, 3)
    stereo_r: jnp.ndarray       # (F, 3)
    stereo_J_pose: jnp.ndarray  # (F, 3, 6)
    stereo_J_lm: jnp.ndarray    # (F, 3, 3)

    def error(self) -> jnp.ndarray:
        """0.5 * sum of squared whitened residuals (GTSAM error)."""
        return 0.5 * (
            jnp.sum(self.prior_pose_r**2)
            + jnp.sum(self.prior_vel_r**2)
            + jnp.sum(self.prior_bias_r**2)
            + jnp.sum(self.marg_r**2)
            + jnp.sum(self.imu_r**2)
            + jnp.sum(self.dvl_r**2)
            + jnp.sum(self.stereo_r**2)
        )


def _lin(fn, dim: int):
    """Residual fn of a tangent vector -> (r0, J) at zero."""
    zero = jnp.zeros(dim)
    return fn(zero), jax.jacfwd(fn)(zero)


def linearize_graph(
    graph: GraphArrays,
    values: Values,
    cam: StereoCamera,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    huber_delta: float | None = None,
) -> Linearization:
    poses = Pose3(values.pose_quat, values.pose_trans)

    # ---- priors ----------------------------------------------------------
    p = graph.priors
    prior_pose = Pose3(p.pose_quat, p.pose_trans)

    def f_prior_pose(xi):
        return prior_pose_residual(
            pose_retract(values.pose(0), xi), prior_pose, p.pose_sigmas
        )

    prior_pose_r, prior_pose_J = _lin(f_prior_pose, 6)

    def f_prior_vel(dv):
        return prior_vel_residual(values.vel[0] + dv, p.vel, p.vel_sigma)

    prior_vel_r, prior_vel_J = _lin(f_prior_vel, 3)

    def f_prior_bias(db):
        # weight = 1/sigma; 0 disables (reference has no bias prior,
        # batch.py:274).
        return p.bias_weight * (values.bias + db - p.bias)

    prior_bias_r, prior_bias_J = _lin(f_prior_bias, 6)

    def f_marg(d):
        # Dense marginal prior from fixed-lag marginalization: whitened
        # tangent deviation of [pose_0, vel_0, bias] from the stored
        # linearization point.
        pose0 = pose_retract(values.pose(0), d[:6])
        dev = jnp.concatenate(
            [
                pose_local(Pose3(p.marg_pose_quat, p.marg_pose_trans), pose0),
                values.vel[0] + d[6:9] - p.marg_vel,
                values.bias + d[9:15] - p.marg_bias,
            ]
        )
        return p.marg_weight * (p.marg_sqrt_info @ dev)

    marg_r, marg_J = _lin(f_marg, 15)

    # ---- IMU (one vmapped linearization over intervals) ------------------
    def f_imu(d, pose_i, vel_i, pose_j, vel_j, data, whitener):
        xi_i, dv_i, xi_j, dv_j, db = (
            d[0:6], d[6:9], d[9:15], d[15:18], d[18:24],
        )
        return imu_residual(
            pose_retract(pose_i, xi_i),
            vel_i + dv_i,
            pose_retract(pose_j, xi_j),
            vel_j + dv_j,
            values.bias + db,
            data,
            gravity,
            whitener,
        )

    def lin_imu(pose_i, vel_i, pose_j, vel_j, data, whitener, mask):
        fn = lambda d: f_imu(d, pose_i, vel_i, pose_j, vel_j, data, whitener)
        r0, J = _lin(fn, 24)
        return r0 * mask, J * mask

    # Interval k couples frames (k, k+1); the builder pads to >=1 interval
    # even for a single-pose graph (mask 0), so index with clamping.
    n = values.num_poses
    n_int = graph.imu.mask.shape[0]
    ki = jnp.minimum(jnp.arange(n_int), n - 1)
    kj = jnp.minimum(jnp.arange(n_int) + 1, n - 1)
    pose_i = Pose3(values.pose_quat[ki], values.pose_trans[ki])
    pose_j = Pose3(values.pose_quat[kj], values.pose_trans[kj])
    imu_r, imu_J = jax.vmap(lin_imu)(
        pose_i,
        values.vel[ki],
        pose_j,
        values.vel[kj],
        graph.imu.data,
        graph.imu.whitener,
        graph.imu.mask,
    )
    imu_J_pose_i = imu_J[..., 0:6]
    imu_J_vel_i = imu_J[..., 6:9]
    imu_J_pose_j = imu_J[..., 9:15]
    imu_J_vel_j = imu_J[..., 15:18]
    imu_J_bias = imu_J[..., 18:24]

    # ---- DVL -------------------------------------------------------------
    def lin_dvl(pose, vel, meas, mask):
        def fn(d):
            return dvl_residual(
                pose_retract(pose, d[:6]), vel + d[6:9], meas, dvl_sigma
            )

        r0, J = _lin(fn, 9)
        return r0 * mask, J * mask

    dvl_r, dvl_J = jax.vmap(lin_dvl)(
        poses, values.vel, graph.dvl.vel_body, graph.dvl.mask
    )
    dvl_J_pose = dvl_J[..., :6]
    dvl_J_vel = dvl_J[..., 6:]

    # ---- stereo ----------------------------------------------------------
    def lin_stereo(pose, lm, meas, mask):
        def fn(d):
            return stereo_residual(
                cam, pose_retract(pose, d[:6]), lm + d[6:9], meas, stereo_sigma
            )

        r0, J = _lin(fn, 9)
        if huber_delta is not None:
            # IRLS Huber: scale residual+Jacobian by sqrt(w),
            # w = min(1, delta/||r||) — re-evaluated each linearization.
            nrm = jnp.linalg.norm(r0)
            w = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(nrm, 1e-9)))
            r0, J = r0 * w, J * w
        return r0 * mask, J * mask

    s = graph.stereo
    obs_poses = Pose3(values.pose_quat[s.cam_idx], values.pose_trans[s.cam_idx])
    stereo_r, stereo_J = jax.vmap(lin_stereo)(
        obs_poses, values.landmarks[s.lm_idx], s.meas, s.mask
    )

    return Linearization(
        prior_pose_r=prior_pose_r,
        prior_pose_J=prior_pose_J,
        prior_vel_r=prior_vel_r,
        prior_vel_J=prior_vel_J,
        prior_bias_r=prior_bias_r,
        prior_bias_J=prior_bias_J,
        marg_r=marg_r,
        marg_J=marg_J,
        imu_r=imu_r,
        imu_J_pose_i=imu_J_pose_i,
        imu_J_vel_i=imu_J_vel_i,
        imu_J_pose_j=imu_J_pose_j,
        imu_J_vel_j=imu_J_vel_j,
        imu_J_bias=imu_J_bias,
        dvl_r=dvl_r,
        dvl_J_pose=dvl_J_pose,
        dvl_J_vel=dvl_J_vel,
        stereo_r=stereo_r,
        stereo_J_pose=stereo_J[..., :6],
        stereo_J_lm=stereo_J[..., 6:],
    )


def graph_error(
    graph: GraphArrays,
    values: Values,
    cam: StereoCamera,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    huber_delta: float | None = None,
) -> jnp.ndarray:
    """Total error without Jacobians (for LM step acceptance). With a Huber
    delta, stereo terms use the Huber cost rho(||r||)."""
    poses = Pose3(values.pose_quat, values.pose_trans)
    p = graph.priors
    e = 0.5 * jnp.sum(
        prior_pose_residual(
            values.pose(0), Pose3(p.pose_quat, p.pose_trans), p.pose_sigmas
        )
        ** 2
    )
    e += 0.5 * jnp.sum(
        prior_vel_residual(values.vel[0], p.vel, p.vel_sigma) ** 2
    )
    e += 0.5 * jnp.sum((p.bias_weight * (values.bias - p.bias)) ** 2)

    n = values.num_poses
    n_int = graph.imu.mask.shape[0]
    ki = jnp.minimum(jnp.arange(n_int), n - 1)
    kj = jnp.minimum(jnp.arange(n_int) + 1, n - 1)
    pose_i = Pose3(values.pose_quat[ki], values.pose_trans[ki])
    pose_j = Pose3(values.pose_quat[kj], values.pose_trans[kj])

    def one_imu(pi, vi, pj, vj, data, whitener, mask):
        r = imu_residual(pi, vi, pj, vj, values.bias, data, gravity, whitener)
        return jnp.sum((r * mask) ** 2)

    e += 0.5 * jnp.sum(
        jax.vmap(one_imu)(
            pose_i,
            values.vel[ki],
            pose_j,
            values.vel[kj],
            graph.imu.data,
            graph.imu.whitener,
            graph.imu.mask,
        )
    )

    dvl_r = jax.vmap(lambda pose, vel, meas: dvl_residual(pose, vel, meas, dvl_sigma))(
        poses, values.vel, graph.dvl.vel_body
    )
    e += 0.5 * jnp.sum((dvl_r * graph.dvl.mask[:, None]) ** 2)

    s = graph.stereo
    obs_poses = Pose3(values.pose_quat[s.cam_idx], values.pose_trans[s.cam_idx])
    st_r = jax.vmap(
        lambda pose, lm, meas: stereo_residual(cam, pose, lm, meas, stereo_sigma)
    )(obs_poses, values.landmarks[s.lm_idx], s.meas)
    if huber_delta is None:
        e += 0.5 * jnp.sum((st_r * s.mask[:, None]) ** 2)
    else:
        nrm = jnp.linalg.norm(st_r, axis=-1)
        quad = 0.5 * nrm**2
        lin_cost = huber_delta * (nrm - 0.5 * huber_delta)
        rho = jnp.where(nrm <= huber_delta, quad, lin_cost)
        e += jnp.sum(rho * s.mask)
    return e
