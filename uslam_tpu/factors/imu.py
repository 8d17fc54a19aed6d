"""IMU preintegration and the preintegrated IMU factor.

Replaces GTSAM ``PreintegratedImuMeasurements`` + ``ImuFactor``
(reference batch.py:91,237-239,289-293). The reference buffers raw
(acc, gyro) 6-vectors between keyframes (batch.py:138-141) and integrates
them with a hard-coded dt of 0.005 s at graph-build time (batch.py:290).

TPU-native design differences (deliberate, see SURVEY.md §7):

- Raw samples are kept, padded to a static ``S`` per interval (dt == 0 rows
  are padding and integrate to a no-op), and preintegration is a
  ``lax.scan`` — one fused kernel for all intervals via ``vmap``.
- The residual *re-integrates* as a function of the current bias estimate —
  exact bias dependence through AD instead of GTSAM's first-order bias
  correction Jacobians. Cheaper than it sounds (the scan is tiny) and
  strictly more accurate.
- The 9x9 preintegration covariance (state order [dtheta, dv, dp]) is
  propagated once at the initial bias and its inverse square root is cached
  as the whitening matrix, matching GTSAM's fixed-at-preintegration noise.

Gravity convention: ``MakeSharedU(9.81)`` (batch.py:181) => world gravity
vector g = (0, 0, -9.81).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uslam_tpu.geometry.se3 import Pose3
from uslam_tpu.geometry.so3 import (
    quat_conjugate,
    quat_identity,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_hat,
    so3_left_jacobian,
    so3_log,
)


class ImuIntervalData(NamedTuple):
    """Raw buffered IMU samples for the interval(s) between keyframes.

    acc:  (..., S, 3) accelerometer [m/s^2]
    gyro: (..., S, 3) gyroscope [rad/s]
    dt:   (..., S)    per-sample dt [s]; 0 marks padding
    """

    acc: jnp.ndarray
    gyro: jnp.ndarray
    dt: jnp.ndarray


class PreintegratedDelta(NamedTuple):
    delta_q: jnp.ndarray  # (..., 4) body-frame rotation delta
    delta_v: jnp.ndarray  # (..., 3) velocity delta in frame i
    delta_p: jnp.ndarray  # (..., 3) position delta in frame i
    dt_total: jnp.ndarray  # (...,)


def preintegrate(data: ImuIntervalData, bias: jnp.ndarray) -> PreintegratedDelta:
    """Integrate one interval's samples at the given bias [ba(3), bg(3)].

    Standard body-frame preintegration (midpoint-free, forward Euler — the
    same discretization GTSAM's ManifoldPreintegration uses):

        dR_{k+1} = dR_k Exp((w - bg) dt)
        dv_{k+1} = dv_k + dR_k (a - ba) dt
        dp_{k+1} = dp_k + dv_k dt + 0.5 dR_k (a - ba) dt^2
    """
    ba, bg = bias[:3], bias[3:]

    def step(carry, sample):
        q, v, p, t = carry
        a, w, dt = sample
        a_c = a - ba
        w_c = w - bg
        acc_world = quat_rotate(q, a_c)
        p_new = p + v * dt + 0.5 * acc_world * dt * dt
        v_new = v + acc_world * dt
        q_new = quat_normalize(quat_multiply(q, so3_exp(w_c * dt)))
        return (q_new, v_new, p_new, t + dt), None

    init = (
        quat_identity(data.acc.dtype),
        jnp.zeros(3, data.acc.dtype),
        jnp.zeros(3, data.acc.dtype),
        jnp.zeros((), data.dt.dtype),
    )
    (q, v, p, t), _ = jax.lax.scan(step, init, (data.acc, data.gyro, data.dt))
    return PreintegratedDelta(q, v, p, t)


def preintegrate_with_cov(
    data: ImuIntervalData,
    bias: jnp.ndarray,
    accel_cov: float,
    gyro_cov: float,
    integration_cov: float,
) -> tuple[PreintegratedDelta, jnp.ndarray]:
    """Preintegrate and propagate the 9x9 covariance, state [dtheta, dv, dp].

    Discrete propagation (Forster et al. TRO'17 eq. 62-63, the model GTSAM
    implements): with R_k the preintegrated rotation so far and
    a = acc - ba, w = gyro - bg,

        A = [ Exp(w dt)^T          0      0 ]
            [ -R_k hat(a) dt       I      0 ]
            [ -0.5 R_k hat(a) dt^2 I dt   I ]

        noise: dtheta <- Jr(w dt) dt * n_g ; dv <- R_k dt * n_a ;
               dp <- 0.5 R_k dt^2 * n_a  (+ integration noise on dp).

    Covariance parameters mirror reference batch.py:183-185.
    """
    ba, bg = bias[:3], bias[3:]
    dtype = data.acc.dtype

    def step(carry, sample):
        q, v, p, t, P = carry
        a, w, dt = sample
        a_c = a - ba
        w_c = w - bg
        Rk = quat_to_matrix(q)
        acc_world = Rk @ a_c

        wdt = w_c * dt
        dq = so3_exp(wdt)
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(quat_to_matrix(dq).T)
        A = A.at[3:6, 0:3].set(-Rk @ so3_hat(a_c) * dt)
        A = A.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
        A = A.at[6:9, 0:3].set(-0.5 * Rk @ so3_hat(a_c) * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype))

        # Right Jacobian Jr(wdt) = J_l(-wdt).
        Jr = so3_left_jacobian(-wdt)
        G_g = Jr * dt                      # dtheta rows
        G_a_v = Rk * dt                    # dv rows
        G_a_p = 0.5 * Rk * dt * dt         # dp rows

        # GTSAM semantics: accelerometer/gyroscope covariances are
        # continuous-time noise densities; the discrete per-sample
        # covariance is sigma^2 / dt (PreintegrationBase::integrateMeasurement),
        # so each contribution below is G (sigma^2/dt) G^T ~ sigma^2 * dt.
        inv_dt = jnp.where(dt > 0.0, 1.0 / jnp.maximum(dt, 1e-9), 0.0)
        Q = jnp.zeros((9, 9), dtype)
        Q = Q.at[0:3, 0:3].set(gyro_cov * inv_dt * (G_g @ G_g.T))
        Q = Q.at[3:6, 3:6].set(accel_cov * inv_dt * (G_a_v @ G_a_v.T))
        Q = Q.at[3:6, 6:9].set(accel_cov * inv_dt * (G_a_v @ G_a_p.T))
        Q = Q.at[6:9, 3:6].set(accel_cov * inv_dt * (G_a_p @ G_a_v.T))
        Q = Q.at[6:9, 6:9].set(
            accel_cov * inv_dt * (G_a_p @ G_a_p.T)
            + integration_cov * dt * jnp.eye(3, dtype=dtype)
        )

        P_new = A @ P @ A.T + Q
        # dt == 0 padding: identity transition, zero noise — a no-op.
        is_pad = dt <= 0.0
        P_new = jnp.where(is_pad, P, P_new)

        p_new = p + v * dt + 0.5 * acc_world * dt * dt
        v_new = v + acc_world * dt
        q_new = quat_normalize(quat_multiply(q, dq))
        return (q_new, v_new, p_new, t + dt, P_new), None

    init = (
        quat_identity(dtype),
        jnp.zeros(3, dtype),
        jnp.zeros(3, dtype),
        jnp.zeros((), data.dt.dtype),
        jnp.zeros((9, 9), dtype),
    )
    (q, v, p, t, P), _ = jax.lax.scan(step, init, (data.acc, data.gyro, data.dt))
    return PreintegratedDelta(q, v, p, t), P


def whitener_from_cov(P: jnp.ndarray, jitter: float = 1e-12) -> jnp.ndarray:
    """Inverse square root (lower-tri) of a covariance: W s.t. W P W^T = I.

    Whitened residual = W @ r. Computed as inv(chol(P)).
    """
    dim = P.shape[-1]
    L = jnp.linalg.cholesky(P + jitter * jnp.eye(dim, dtype=P.dtype))
    eye = jnp.broadcast_to(jnp.eye(dim, dtype=P.dtype), P.shape)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def imu_residual(
    pose_i: Pose3,
    vel_i: jnp.ndarray,
    pose_j: Pose3,
    vel_j: jnp.ndarray,
    bias: jnp.ndarray,
    data: ImuIntervalData,
    gravity: float,
    whitener: jnp.ndarray,
) -> jnp.ndarray:
    """9-dim whitened ImuFactor residual, order [r_dR, r_dv, r_dp].

    GTSAM ImuFactor semantics (the factor pushed at reference batch.py:291):

        r_dR = Log( dR(b)^T R_i^T R_j )
        r_dv = R_i^T (v_j - v_i - g T)        - dv(b)
        r_dp = R_i^T (p_j - p_i - v_i T - 0.5 g T^2) - dp(b)
    """
    delta = preintegrate(data, bias)
    T = delta.dt_total.astype(pose_i.trans.dtype)
    g = jnp.array([0.0, 0.0, -gravity], dtype=pose_i.trans.dtype)

    qi_inv = quat_conjugate(pose_i.quat)
    r_dR = so3_log(
        quat_multiply(quat_conjugate(delta.delta_q), quat_multiply(qi_inv, pose_j.quat))
    )
    r_dv = quat_rotate(qi_inv, vel_j - vel_i - g * T) - delta.delta_v
    r_dp = (
        quat_rotate(qi_inv, pose_j.trans - pose_i.trans - vel_i * T - 0.5 * g * T * T)
        - delta.delta_p
    )
    r = jnp.concatenate([r_dR, r_dv, r_dp])
    return whitener @ r
