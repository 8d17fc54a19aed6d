"""Sensor prefilters.

C15 in the component inventory: the reference's isam-only IMU low-pass
(order-3 Butterworth, fs = 30 Hz, cutoff 0.5 Hz, zero-phase ``filtfilt`` —
reference isam.py:271-287). Reimplemented as a jit/scan IIR: coefficients
via the bilinear transform (host-side, no scipy needed at runtime),
forward-backward application for zero phase.

C17: the isam-only explicit gravity compensation (rotate world gravity into
the body frame via the IMU orientation quaternion and add to the measured
acceleration, reference isam.py:162-171). The batch path does NOT do this —
gravity is handled inside preintegration (MakeSharedU, batch.py:181), which
is what our ImuFactor does too — so this helper exists for parity with the
isam pipeline's data conditioning, not for the batch solver.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.geometry.so3 import quat_rotate


def butter_lowpass_coeffs(order: int, cutoff_hz: float, fs_hz: float):
    """Butterworth low-pass (b, a) via bilinear transform of the analog
    prototype — matches scipy.signal.butter(order, cutoff/(fs/2))."""
    # Analog prototype poles on the unit circle (left half plane).
    poles = np.array(
        [np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order)) for k in range(order)]
    )
    # Pre-warped analog cutoff.
    warped = 2 * fs_hz * math.tan(math.pi * cutoff_hz / fs_hz)
    poles = poles * warped
    gain = warped**order
    # Bilinear transform: s = 2 fs (z-1)/(z+1).
    fs2 = 2 * fs_hz
    z_poles = (fs2 + poles) / (fs2 - poles)
    gain = gain.real / np.prod(fs2 - poles).real
    # All zeros of the low-pass at z = -1.
    b = gain * np.poly(-np.ones(order)).real
    a = np.poly(z_poles).real
    return jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)


def _lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state DF2T initial state per unit input (scipy lfilter_zi)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = len(a)
    companion = np.zeros((n - 1, n - 1))
    companion[0, :] = -a[1:] / a[0]
    companion[1:, :-1] = np.eye(n - 2)
    IminusA = np.eye(n - 1) - companion.T
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(IminusA, B)


def _iir_forward(
    b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray, zi: jnp.ndarray
) -> jnp.ndarray:
    """Direct-form II transposed IIR along axis 0 via lax.scan.

    zi: (order,) steady-state unit-input state; scaled by x[0] like scipy's
    filtfilt does, so heavy low-pass filters don't ring at the edges."""
    order = a.shape[0] - 1
    b = b / a[0]
    a = a / a[0]

    def step(state, xt):
        yt = b[0] * xt + state[0]
        new_state = jnp.concatenate(
            [state[1:], jnp.zeros((1,) + xt.shape, x.dtype)], axis=0
        )
        taps = jnp.arange(1, order + 1)
        upd = b[taps][:, None] * xt[None, :] - a[taps][:, None] * yt[None, :]
        return new_state + upd, yt

    init = zi[:, None] * x[0][None, :]
    _, y = jax.lax.scan(step, init, x)
    return y


def filtfilt(b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase forward-backward filtering along axis 0 (edge-padded by
    reflection, like scipy's default odd extension but simpler)."""
    order = a.shape[0] - 1
    pad = 3 * (order + 1)
    pad = min(pad, x.shape[0] - 1)
    x_ext = jnp.concatenate(
        [2 * x[0] - x[1 : pad + 1][::-1], x, 2 * x[-1] - x[-pad - 1 : -1][::-1]],
        axis=0,
    )
    zi = jnp.asarray(_lfilter_zi(np.asarray(b), np.asarray(a)), x.dtype)
    y = _iir_forward(b, a, x_ext, zi)
    y = _iir_forward(b, a, y[::-1], zi)[::-1]
    return y[pad : pad + x.shape[0]]


def smooth_imu(
    data: jnp.ndarray, fs: float = 30.0, cutoff: float = 0.5, order: int = 3
) -> jnp.ndarray:
    """Low-pass the (T, C) IMU stream — the reference ``smooth_imu``
    parameters (isam.py:271-287)."""
    b, a = butter_lowpass_coeffs(order, cutoff, fs)
    return filtfilt(b, a, jnp.asarray(data, jnp.float32))


def gravity_compensate(
    acc_body: jnp.ndarray, quat_wxyz: jnp.ndarray, gravity: float = 9.81
) -> jnp.ndarray:
    """Reference isam.py:162-171: rotate world gravity (0, 0, -g) into the
    body frame with the IMU orientation and ADD it to the measured specific
    force, yielding linear acceleration."""
    g_world = jnp.array([0.0, 0.0, -gravity], acc_body.dtype)
    from uslam_tpu.geometry.so3 import quat_conjugate

    g_body = quat_rotate(quat_conjugate(quat_wxyz), g_world)
    return acc_body + g_body
