"""Physically-consistent synthetic AUV sequences.

The bagfile that drives the reference is private (reference README.md:52),
so every integration test and benchmark runs on generated data with known
ground truth (SURVEY.md §4, configs 3-5).

Trajectory model: a horizontal circle of radius ``R`` at angular rate
``omega`` with a slow climb ``climb_rate``, camera/body frame looking along
the direction of travel (z forward, x right, y down — camera optical
convention, so the stereo model applies directly). Everything below is
analytic, so the simulated IMU (specific force + body rates) integrates
*exactly* to the simulated trajectory: the solver can be tested to
tolerance limited only by discretization.

World frame: z-up, gravity (0, 0, -g) (MakeSharedU convention,
reference batch.py:181).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from uslam_tpu.config import CameraConfig, PressureConfig
from uslam_tpu.io.sequence import FeatureFrame, SensorSequence

# Bump whenever the renderer or SyntheticSpec defaults change behavior:
# disk caches of rendered streams (bench.py) key on this so a renderer
# change can never silently reuse stale imagery.
RENDER_VERSION = 1


@dataclass
class SyntheticSpec:
    duration: float = 20.0          # seconds
    keyframe_rate: float = 5.0      # Hz (reference cadence, batch.py:328)
    imu_rate: float = 200.0         # Hz (batch.py:34)
    # 'orbit': horizontal circle (loop closures every lap — exercises
    # global consistency). 'survey': sinusoidal transect that never
    # revisits (the actual AUV survey pattern) — landmark tracks have
    # bounded frame span, the regime the banded large-N solver
    # (solvers/banded.py) is built for.
    trajectory: str = "orbit"
    radius: float = 5.0             # m
    omega: float = 0.25             # rad/s around the circle
    # Survey-mode shape: forward speed is omega*radius (same speed scale
    # as the orbit); lateral sweep y = A sin(2 pi x / wavelength).
    survey_amplitude: float = 3.0   # m
    survey_wavelength: float = 40.0  # m
    climb_rate: float = -0.02       # m/s (slow dive)
    z0: float = -2.0                # initial depth (z, world)
    ramp_tau: float = 2.0           # s; speed ramps 0 -> omega*R (rest start,
                                    # consistent with the zero-velocity prior
                                    # the reference puts on V(0), batch.py:282)
    num_landmarks: int = 200
    landmark_ring_width: float = 3.0
    landmark_z_spread: float = 2.0
    max_feature_depth: float = 15.0  # visibility cutoff (camera z)
    min_feature_depth: float = 0.5
    gravity: float = 9.81
    # Noise (std-dev); zeros give a noise-free oracle sequence.
    imu_acc_noise: float = 0.0
    imu_gyro_noise: float = 0.0
    dvl_noise: float = 0.0
    feature_noise_px: float = 0.0
    odom_drift_rate: float = 0.0    # m per sqrt(s) random-walk on DVL pose
    seed: int = 0


def _pose_at(spec: SyntheticSpec, t: np.ndarray):
    """Analytic pose/velocity/acceleration/body-rates at times t (vectorized).

    Returns dict of arrays: pos (T,3), R (T,3,3) world_T_body rotation,
    vel (T,3) world, acc (T,3) world, omega_body (T,3).
    """
    if spec.trajectory == "survey":
        return _pose_at_survey(spec, t)
    # Smooth rest-start angle profile: th(t) = omega (t - tau (1 - e^{-t/tau}))
    # => th' = omega (1 - e^{-t/tau}) (0 at t=0), th'' = (omega/tau) e^{-t/tau}.
    tau = spec.ramp_tau
    e = np.exp(-t / tau)
    th = spec.omega * (t - tau * (1.0 - e))
    dth = spec.omega * (1.0 - e)
    ddth = (spec.omega / tau) * e
    c, s = np.cos(th), np.sin(th)
    R_c = spec.radius
    pos = np.stack([R_c * c, R_c * s, spec.z0 + spec.climb_rate * t], axis=-1)
    vel = np.stack(
        [-R_c * dth * s, R_c * dth * c, np.full_like(t, spec.climb_rate)], axis=-1
    )
    acc = np.stack(
        [
            -R_c * ddth * s - R_c * dth**2 * c,
            R_c * ddth * c - R_c * dth**2 * s,
            np.zeros_like(t),
        ],
        axis=-1,
    )
    # Body axes in world coords: z forward (tangent), y down, x right.
    zb = np.stack([-s, c, np.zeros_like(t)], axis=-1)
    yb = np.stack([np.zeros_like(t), np.zeros_like(t), -np.ones_like(t)], axis=-1)
    xb = np.cross(yb, zb)
    R = np.stack([xb, yb, zb], axis=-1)  # columns are body axes
    # Frame spins about world z at rate th'(t).
    om_w = np.stack([np.zeros_like(t), np.zeros_like(t), dth], axis=-1)
    om_b = np.einsum("tij,tj->ti", np.swapaxes(R, -1, -2), om_w)
    return {"pos": pos, "R": R, "vel": vel, "acc": acc, "omega_body": om_b}


def _pose_at_survey(spec: SyntheticSpec, t: np.ndarray):
    """Sinusoidal transect: x advances at ramped speed v = omega*radius,
    y = A sin(2 pi x / wavelength), slow climb in z. Never revisits — the
    bounded-track-span regime (real AUV survey/lawnmower missions). All
    derivatives analytic, so the simulated IMU integrates exactly to the
    trajectory (same contract as the orbit model)."""
    v = spec.omega * spec.radius
    tau = spec.ramp_tau
    e = np.exp(-t / tau)
    u = v * (t - tau * (1.0 - e))          # ramped forward distance
    du = v * (1.0 - e)                     # = dx/dt (0 at rest start)
    ddu = (v / tau) * e
    A = spec.survey_amplitude
    k = 2.0 * np.pi / spec.survey_wavelength
    sin_ku, cos_ku = np.sin(k * u), np.cos(k * u)

    pos = np.stack([u, A * sin_ku, spec.z0 + spec.climb_rate * t], axis=-1)
    vel = np.stack(
        [du, A * k * cos_ku * du, np.full_like(t, spec.climb_rate)], axis=-1
    )
    acc = np.stack(
        [
            ddu,
            A * k * cos_ku * ddu - A * k * k * sin_ku * du * du,
            np.zeros_like(t),
        ],
        axis=-1,
    )
    # Heading follows the horizontal path tangent; well-defined at rest
    # (slope A k cos(ku) is a function of position, not speed).
    slope = A * k * cos_ku
    psi = np.arctan(slope)                 # heading about world z
    dpsi = (-A * k * k * sin_ku / (1.0 + slope * slope)) * du
    c, s = np.cos(psi), np.sin(psi)
    zb = np.stack([c, s, np.zeros_like(t)], axis=-1)     # forward
    yb = np.stack([np.zeros_like(t), np.zeros_like(t), -np.ones_like(t)], axis=-1)
    xb = np.cross(yb, zb)
    R = np.stack([xb, yb, zb], axis=-1)
    om_w = np.stack([np.zeros_like(t), np.zeros_like(t), dpsi], axis=-1)
    om_b = np.einsum("tij,tj->ti", np.swapaxes(R, -1, -2), om_w)
    return {"pos": pos, "R": R, "vel": vel, "acc": acc, "omega_body": om_b}


def _render_stereo_images(
    spec: SyntheticSpec,
    cam: CameraConfig,
    kf: dict,
    landmarks: np.ndarray,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    """Render simple rectified stereo pairs: each landmark is a small
    high-contrast square (a corner factory the FAST detector finds and
    rBRIEF can re-identify across frames) on a low-contrast noise floor.

    Not photorealistic — it exists so the full images -> ORB front-end ->
    solver path can be tested end-to-end with known geometry
    (SURVEY.md §4 config 5).
    """
    h, w = cam.resolution_y, cam.resolution_x
    T = len(kf["pos"])
    base = rng.uniform(40, 60, (h, w)).astype(np.float32)   # sub-threshold noise
    # Per-landmark stable appearance: a random 9x9 pattern, bright on dark.
    n_lm = len(landmarks)
    pats = rng.uniform(120, 255, (n_lm, 9, 9)).astype(np.float32)
    pats[:, 2:7, 2:7] = rng.uniform(0, 40, (n_lm, 5, 5))     # inner contrast

    left = np.zeros((T, h, w), np.float32)
    right = np.zeros((T, h, w), np.float32)
    fx, fy, cx, cy, b = cam.fx, cam.fy, cam.cx, cam.cy, cam.baseline
    for t in range(T):
        Rwb, p = kf["R"][t], kf["pos"][t]
        p_cam = (landmarks - p) @ Rwb
        z = p_cam[:, 2]
        il = base.copy()
        ir = base.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            uL = fx * p_cam[:, 0] / z + cx
            uR = fx * (p_cam[:, 0] - b) / z + cx
            v = fy * p_cam[:, 1] / z + cy
        for j in range(n_lm):
            if not (spec.min_feature_depth < z[j] < spec.max_feature_depth):
                continue
            for img, u in ((il, uL[j]), (ir, uR[j])):
                yi, xi = int(round(v[j])) - 4, int(round(u)) - 4
                if 0 <= yi and yi + 9 <= h and 0 <= xi and xi + 9 <= w:
                    img[yi : yi + 9, xi : xi + 9] = pats[j]
        left[t] = il
        right[t] = ir
    return left, right


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """(T,3,3) -> (T,4) wxyz, numpy/f64 (host-side)."""
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # xyzw
    q = np.concatenate([q[:, 3:4], q[:, :3]], axis=-1)
    return np.where(q[:, :1] < 0, -q, q)


def generate_synthetic_sequence(
    spec: SyntheticSpec = SyntheticSpec(),
    cam_cfg: CameraConfig = CameraConfig(),
    pressure_cfg: PressureConfig = PressureConfig(),
    render_images: bool = False,
    omit_features: bool = False,
) -> SensorSequence:
    rng = np.random.default_rng(spec.seed)
    g_world = np.array([0.0, 0.0, -spec.gravity])

    # --- IMU stream -------------------------------------------------------
    imu_t = np.arange(0.0, spec.duration, 1.0 / spec.imu_rate)
    st = _pose_at(spec, imu_t)
    # Specific force measured by an ideal accelerometer: R^T (a - g).
    f_body = np.einsum(
        "tij,tj->ti", np.swapaxes(st["R"], -1, -2), st["acc"] - g_world
    )
    acc_meas = f_body + rng.normal(0, spec.imu_acc_noise, f_body.shape)
    gyro_meas = st["omega_body"] + rng.normal(0, spec.imu_gyro_noise, f_body.shape)

    # --- keyframe-rate streams (DVL pose/twist, pressure, features) -------
    kf_t = np.arange(0.0, spec.duration, 1.0 / spec.keyframe_rate)
    kf = _pose_at(spec, kf_t)
    kf_quat = _rot_to_quat(kf["R"])

    # DVL twist: body-frame velocity (A50 reports body-frame velocity).
    vel_body = np.einsum("tij,tj->ti", np.swapaxes(kf["R"], -1, -2), kf["vel"])
    dvl_twist = vel_body + rng.normal(0, spec.dvl_noise, vel_body.shape)

    # DVL dead-reckoned pose: truth + optional random-walk drift.
    drift = np.cumsum(
        rng.normal(0, spec.odom_drift_rate / np.sqrt(spec.keyframe_rate), (len(kf_t), 3)),
        axis=0,
    )
    dvl_pos = kf["pos"] + drift

    # Pressure: invert the depth conversion (batch.py:122-126) so that
    # pressure_to_depth(press) == true z.
    depth = kf["pos"][:, 2]
    press_pa = depth * (pressure_cfg.water_density * pressure_cfg.gravity) + pressure_cfg.atm_pressure_pa
    press_mbar = press_pa / 100.0

    # --- landmarks + stereo features --------------------------------------
    if spec.trajectory == "survey":
        # Scattered along the corridor the transect sweeps through, with
        # depth tracking the dive profile so they stay in view when passed.
        v_fwd = spec.omega * spec.radius
        x_max = v_fwd * spec.duration
        x_lm = rng.uniform(0.0, x_max + spec.max_feature_depth, spec.num_landmarks)
        y_lm = spec.survey_amplitude * np.sin(
            2.0 * np.pi * x_lm / spec.survey_wavelength
        ) + rng.uniform(
            -spec.landmark_ring_width, spec.landmark_ring_width, spec.num_landmarks
        )
        z_lm = (
            spec.z0
            + spec.climb_rate * (x_lm / max(v_fwd, 1e-9))
            + rng.uniform(
                -spec.landmark_z_spread, spec.landmark_z_spread, spec.num_landmarks
            )
        )
        landmarks = np.stack([x_lm, y_lm, z_lm], axis=-1)
    else:
        r_lm = spec.radius + rng.uniform(
            -spec.landmark_ring_width, spec.landmark_ring_width, spec.num_landmarks
        )
        th_lm = rng.uniform(0, 2 * np.pi, spec.num_landmarks)
        z_lm = spec.z0 + rng.uniform(
            -spec.landmark_z_spread, spec.landmark_z_spread, spec.num_landmarks
        )
        landmarks = np.stack(
            [r_lm * np.cos(th_lm), r_lm * np.sin(th_lm), z_lm], axis=-1
        )

    fx, fy, cx, cy, b = cam_cfg.fx, cam_cfg.fy, cam_cfg.cx, cam_cfg.cy, cam_cfg.baseline
    rx, ry = cam_cfg.resolution_x, cam_cfg.resolution_y
    features: list[FeatureFrame] = []
    for k, t in enumerate(kf_t):
        Rwb, p = kf["R"][k], kf["pos"][k]
        p_cam = (landmarks - p) @ Rwb  # R^T (l - p), rows
        z = p_cam[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            uL = fx * p_cam[:, 0] / z + cx
            uR = fx * (p_cam[:, 0] - b) / z + cx
            v = fy * p_cam[:, 1] / z + cy
        vis = (
            (z > spec.min_feature_depth)
            & (z < spec.max_feature_depth)
            & (uL >= 0) & (uL < rx)
            & (uR >= 0) & (uR < rx)
            & (v >= 0) & (v < ry)
        )
        ids = np.nonzero(vis)[0]
        n_px = spec.feature_noise_px
        uLn = uL[vis] + rng.normal(0, n_px, ids.shape)
        uRn = uR[vis] + rng.normal(0, n_px, ids.shape)
        vn = v[vis] + rng.normal(0, n_px, ids.shape)
        # Encode as the nodelet's normalized [-1, 1] coords (batch.py:152-154).
        features.append(
            FeatureFrame(
                t=float(t),
                ids=ids.astype(np.int64),
                u0=uLn / (0.5 * rx) - 1.0,
                v0=vn / (0.5 * ry) - 1.0,
                u1=uRn / (0.5 * rx) - 1.0,
                v1=vn / (0.5 * ry) - 1.0,
            )
        )

    images = None
    image_t = None
    if render_images:
        images = _render_stereo_images(spec, cam_cfg, kf, landmarks, rng)
        image_t = kf_t.copy()

    vel_kf = kf["vel"]
    if render_images:
        return SensorSequence(
            imu_t=imu_t,
            imu_acc=acc_meas,
            imu_gyro=gyro_meas,
            pressure_t=kf_t.copy(),
            pressure_mbar=press_mbar,
            dvl_pose_t=kf_t.copy(),
            dvl_pose_quat=kf_quat,
            dvl_pose_pos=dvl_pos,
            dvl_twist_t=kf_t.copy(),
            dvl_twist_vel=dvl_twist,
            features=[] if omit_features else features,
            image_t=image_t,
            images_left=images[0],
            images_right=images[1],
            gt_t=kf_t.copy(),
            gt_quat=kf_quat,
            gt_pos=kf["pos"],
            gt_vel=vel_kf,
        )
    return SensorSequence(
        imu_t=imu_t,
        imu_acc=acc_meas,
        imu_gyro=gyro_meas,
        pressure_t=kf_t.copy(),
        pressure_mbar=press_mbar,
        dvl_pose_t=kf_t.copy(),
        dvl_pose_quat=kf_quat,
        dvl_pose_pos=dvl_pos,
        dvl_twist_t=kf_t.copy(),
        dvl_twist_vel=dvl_twist,
        features=features,
        gt_t=kf_t.copy(),
        gt_quat=kf_quat,
        gt_pos=kf["pos"],
        gt_vel=vel_kf,
    )
