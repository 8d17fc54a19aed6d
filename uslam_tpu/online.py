"""Online (streaming) SLAM: sensors in, pose estimates out, per keyframe.

This is the working end-to-end version of what the reference's isam.py
attempts (and its nodelet provides): feed IMU / pressure / DVL / stereo
frames as they arrive; every stereo frame that can be time-matched with
fresh DVL messages (the ApproximateTimeSynchronizer contract,
batch.py:325) becomes a keyframe — the ORB front-end extracts and tracks
features, and the fixed-lag smoother updates the estimate.

The reference's online loop updates on odometry callbacks
(isam.py:211-212); here the camera frame triggers (features are the
scarcest stream), with the same slop-gated freshness requirement.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from uslam_tpu.config import DEFAULT_CONFIG, UslamConfig
from uslam_tpu.factors.depth import pressure_to_depth
from uslam_tpu.frontend.tracker import StereoFrontend, integrate_gyro_rotvec
from uslam_tpu.pipeline import AUVSlam
from uslam_tpu.solvers.fixed_lag import FixedLagSmoother
from uslam_tpu.utils.logging import get_logger

log = get_logger("online")


@dataclass
class OnlineSlam:
    config: UslamConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    window: int = 10
    solve_during_fill: bool = True
    # Keep the steady-state window graph + marginal prior ON DEVICE between
    # keyframes (one consolidated upload + one fetch per keyframe instead
    # of rebuilding/shipping the window graph — see
    # solvers.fixed_lag.DeviceWindowState). Biggest win on high-latency
    # device links (remote TPU).
    device_resident: bool = False

    def __post_init__(self):
        self.frontend = StereoFrontend(self.config.camera, self.config.frontend)
        self.smoother = FixedLagSmoother(
            self.config, window=self.window,
            solve_during_fill=self.solve_during_fill,
            device_resident=self.device_resident,
        )
        self._helper = AUVSlam(self.config)   # landmark triangulation helper
        self._imu_buf: list = []
        self._depth: float | None = None
        self._odom: tuple | None = None       # (t, quat, pos)
        self._twist: tuple | None = None      # (t, vel)
        self._mavros: tuple | None = None     # (t, world-frame vel)
        self.keyframes = 0

    # ---- sensor inputs (the reference's subscriber surface) --------------

    def add_imu(self, t: float, acc, gyro, dt: float | None = None) -> None:
        dt = self.config.imu.default_dt if dt is None else dt
        self._imu_buf.append(
            np.concatenate([np.asarray(acc, float), np.asarray(gyro, float), [dt]])
        )

    def add_pressure(self, t: float, press_abs_mbar: float) -> None:
        self._depth = float(pressure_to_depth(press_abs_mbar, self.config.pressure))

    def add_dvl_pose(self, t: float, quat_wxyz, pos_xyz) -> None:
        self._odom = (t, np.asarray(quat_wxyz, float), np.asarray(pos_xyz, float))

    def add_dvl_twist(self, t: float, vel_body) -> None:
        self._twist = (t, np.asarray(vel_body, float))

    def add_mavros_vel(self, t: float, vel_world) -> None:
        """World-frame velocity stream (/mavros/local_position/
        velocity_local): used as the new keyframe's velocity initial
        estimate, the reference incremental node's semantics
        (isam.py:306,365). Optional — keyframes fall back to zero-velocity
        initialization (batch.py:279) when absent or stale."""
        self._mavros = (t, np.asarray(vel_world, float))

    def add_stereo_frame(self, t: float, left, right):
        """Process one stereo pair; returns the current window estimate (or
        None if the frame couldn't be synchronized — reference drop
        semantics, batch.py:54)."""
        slop = self.config.timesync.slop
        if (
            self._odom is None
            or self._twist is None
            or self._depth is None
            or abs(self._odom[0] - t) > slop
            or abs(self._twist[0] - t) > slop
        ):
            log.debug("dropping frame at t=%.3f (unsynchronized)", t)
            return None

        # Gyro-predicted rotation since the previous frame: compensates the
        # temporal RANSAC for vehicle turning (the buffered IMU is exactly
        # the inter-frame window; it is consumed for preintegration below).
        rv = None
        if self._imu_buf and self.keyframes > 0:
            buf = np.stack(self._imu_buf)
            rv = integrate_gyro_rotvec(buf[:, 3:6], buf[:, 6])
        ff = self.frontend.process(
            np.asarray(left), np.asarray(right), t, gyro_rotvec=rv
        )
        _, quat, pos = self._odom
        pos_adj = np.array([pos[0], pos[1], self._depth])
        feats = None
        if len(ff.ids):
            feats = self._helper.get_landmarks(
                ff.ids, ff.u0, ff.v0, ff.u1, ff.v1, quat, pos_adj
            )
        imu = np.stack(self._imu_buf) if self._imu_buf else None
        self._imu_buf = []
        vel0 = np.zeros(3)
        if self._mavros is not None and abs(self._mavros[0] - t) <= slop:
            vel0 = self._mavros[1]
        values = self.smoother.add_keyframe(
            quat, pos_adj, vel0, imu, self._twist[1], feats
        )
        self.keyframes += 1
        return values

    # ---- outputs ----------------------------------------------------------

    def trajectory(self) -> np.ndarray:
        """(T, 3) finalized + in-window positions so far."""
        return self.smoother.full_trajectory()
