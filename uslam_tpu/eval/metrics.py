"""Trajectory metrics.

- ``trajectory_from_values``: pose array extraction — the clean version of
  the reference's ``constr3DPoints`` (batch.py:57-68), which walks X(i) and
  leaves an uninitialized first row callers must slice off; here it's just
  the stacked translation array.
- ``mse_reference_compat``: the reference's self-evaluation metric
  (batch.py:362-367) — mean squared error between the SLAM trajectory and
  DVL odometry after subtracting a z-datum shift (0.7433 m hard-coded at
  batch.py:363) from the odometry. Eval-only; never enters the solver.
- ``ate_rmse``: standard absolute trajectory error the reference lacks.
"""

from __future__ import annotations

import numpy as np

from uslam_tpu.graph.values import Values


def trajectory_from_values(values: Values) -> np.ndarray:
    """(N, 3) translations of all pose variables."""
    return np.asarray(values.pose_trans)


def mse_reference_compat(
    slam_xyz: np.ndarray, odom_xyz: np.ndarray, z_datum_shift: float = 0.7433
) -> float:
    """Reference MSE (batch.py:362-367): odometry shifted down by
    ``z_datum_shift`` in z, then mean over all squared coordinate diffs."""
    odom = np.asarray(odom_xyz, np.float64) - np.array([0.0, 0.0, z_datum_shift])
    diff = odom - np.asarray(slam_xyz, np.float64)
    return float(np.mean(diff**2))


def ate_rmse(
    estimate_xyz: np.ndarray, reference_xyz: np.ndarray, align: bool = False
) -> float:
    """Absolute trajectory error (RMSE over positions).

    With ``align=True``, removes the best-fit rigid transform (Umeyama
    without scale) before computing the error — standard SLAM practice for
    gauge-free comparison."""
    est = np.asarray(estimate_xyz, np.float64)
    ref = np.asarray(reference_xyz, np.float64)
    if align:
        est = _umeyama_align(est, ref)
    return float(np.sqrt(np.mean(np.sum((est - ref) ** 2, axis=-1))))


def rpe_rmse(
    estimate_xyz: np.ndarray, reference_xyz: np.ndarray, delta: int = 1
) -> float:
    """Relative pose error (translation RMSE over ``delta``-step increments)
    — drift-rate metric complementing ATE."""
    est = np.asarray(estimate_xyz, np.float64)
    ref = np.asarray(reference_xyz, np.float64)
    d_est = est[delta:] - est[:-delta]
    d_ref = ref[delta:] - ref[:-delta]
    return float(np.sqrt(np.mean(np.sum((d_est - d_ref) ** 2, axis=-1))))


def _umeyama_align(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Rigid (R, t) aligning src -> dst in least squares."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    S, D = src - mu_s, dst - mu_d
    C = D.T @ S / len(src)
    U, _, Vt = np.linalg.svd(C)
    sgn = np.sign(np.linalg.det(U @ Vt))
    R = U @ np.diag([1.0, 1.0, sgn]) @ Vt
    return (R @ S.T).T + mu_d
