"""Factor residual unit tests (SURVEY.md §4, config 2).

Oracles: analytic closed forms (constant-acceleration / pure-rotation
preintegration), finite differences for Jacobian smoothness, and the
synthetic generator (whose IMU integrates exactly to its trajectory)."""

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import CameraConfig, PressureConfig
from uslam_tpu.factors import (
    ImuIntervalData,
    dvl_residual,
    imu_residual,
    preintegrate,
    preintegrate_with_cov,
    pressure_to_depth,
    prior_pose_residual,
    stereo_residual,
)
from uslam_tpu.factors.imu import whitener_from_cov
from uslam_tpu.geometry import (
    Pose3,
    StereoCamera,
    pose_transform_point_inverse,
    so3_exp,
    stereo_project,
)
from uslam_tpu.io.synthetic import SyntheticSpec, _pose_at, generate_synthetic_sequence

I9 = jnp.eye(9)


def make_interval(acc, gyro, dt, S=None):
    acc = np.atleast_2d(acc)
    n = acc.shape[0]
    data = np.zeros((S or n, 7))
    data[:n, 0:3] = acc
    data[:n, 3:6] = np.atleast_2d(gyro)
    data[:n, 6] = dt
    return ImuIntervalData(
        acc=jnp.asarray(data[:, 0:3], jnp.float32),
        gyro=jnp.asarray(data[:, 3:6], jnp.float32),
        dt=jnp.asarray(data[:, 6], jnp.float32),
    )


class TestPreintegration:
    def test_constant_accel_no_rotation(self):
        # a = (1, 2, 3) for 1 s at 100 Hz: dv = a*T, dp = 0.5 a T^2 + O(dt).
        a = np.array([1.0, 2.0, 3.0])
        data = make_interval(np.tile(a, (100, 1)), np.zeros((100, 3)), 0.01)
        d = preintegrate(data, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(d.delta_v), a, rtol=1e-5)
        # The per-step 0.5 a dt^2 term makes constant acceleration exact.
        np.testing.assert_allclose(np.asarray(d.delta_p), 0.5 * a * 1.0**2, rtol=1e-4)
        np.testing.assert_allclose(float(d.dt_total), 1.0, rtol=1e-5)

    def test_pure_rotation(self):
        w = np.array([0.0, 0.0, 0.5])
        data = make_interval(np.zeros((200, 3)), np.tile(w, (200, 1)), 0.005)
        d = preintegrate(data, jnp.zeros(6))
        expected = so3_exp(jnp.asarray(w * 1.0, jnp.float32))
        np.testing.assert_allclose(np.asarray(d.delta_q), np.asarray(expected), atol=1e-5)

    def test_bias_subtraction(self):
        bias = jnp.array([0.1, -0.2, 0.3, 0.01, 0.02, -0.03])
        a = np.array([1.0, 2.0, 3.0])
        data = make_interval(
            np.tile(a + np.asarray(bias[:3]), (50, 1)),
            np.tile(np.asarray(bias[3:]), (50, 1)),
            0.01,
        )
        d = preintegrate(data, bias)
        np.testing.assert_allclose(np.asarray(d.delta_v), a * 0.5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(d.delta_q), [1, 0, 0, 0], atol=1e-6)

    def test_padding_is_noop(self):
        a = np.tile([1.0, 0, 0], (10, 1))
        d1 = preintegrate(make_interval(a, np.zeros((10, 3)), 0.01), jnp.zeros(6))
        d2 = preintegrate(make_interval(a, np.zeros((10, 3)), 0.01, S=32), jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(d1.delta_v), np.asarray(d2.delta_v), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d1.delta_p), np.asarray(d2.delta_p), atol=1e-6)

    def test_cov_psd_and_whitener(self):
        data = make_interval(
            np.tile([0.5, -1.0, 9.8], (40, 1)),
            np.tile([0.05, 0.1, -0.02], (40, 1)),
            0.005,
        )
        _, P = preintegrate_with_cov(data, jnp.zeros(6), 1e-4, 1e-4, 1e-6)
        Pn = np.asarray(P)
        np.testing.assert_allclose(Pn, Pn.T, atol=1e-10)
        assert np.all(np.linalg.eigvalsh(Pn) > -1e-12)
        W = whitener_from_cov(P, jitter=0.0)
        np.testing.assert_allclose(
            np.asarray(W @ P @ W.T), np.eye(9), atol=1e-3
        )


class TestImuFactor:
    def test_zero_residual_on_synthetic_truth(self):
        """IMU samples generated analytically between two ground-truth
        keyframes must give a (near) zero ImuFactor residual."""
        spec = SyntheticSpec(duration=1.0, imu_rate=400.0, keyframe_rate=5.0)
        t0, t1 = 0.2, 0.4
        ts = np.arange(t0, t1, 1.0 / spec.imu_rate)
        st = _pose_at(spec, ts)
        g = np.array([0, 0, -spec.gravity])
        f_body = np.einsum("tij,tj->ti", np.swapaxes(st["R"], -1, -2), st["acc"] - g)
        data = ImuIntervalData(
            acc=jnp.asarray(f_body, jnp.float32),
            gyro=jnp.asarray(st["omega_body"], jnp.float32),
            dt=jnp.full(len(ts), 1.0 / spec.imu_rate, jnp.float32),
        )
        kf = _pose_at(spec, np.array([t0, t1]))
        from uslam_tpu.io.synthetic import _rot_to_quat

        quats = _rot_to_quat(kf["R"])
        pose_i = Pose3(jnp.asarray(quats[0], jnp.float32), jnp.asarray(kf["pos"][0], jnp.float32))
        pose_j = Pose3(jnp.asarray(quats[1], jnp.float32), jnp.asarray(kf["pos"][1], jnp.float32))
        r = imu_residual(
            pose_i,
            jnp.asarray(kf["vel"][0], jnp.float32),
            pose_j,
            jnp.asarray(kf["vel"][1], jnp.float32),
            jnp.zeros(6),
            data,
            spec.gravity,
            I9,
        )
        # Forward-Euler discretization error at 400 Hz over 0.2 s.
        assert float(jnp.max(jnp.abs(r))) < 5e-3

    def test_residual_sensitive_to_wrong_state(self):
        data = make_interval(np.tile([0, 0, 9.81], (40, 1)), np.zeros((40, 3)), 0.005)
        p = Pose3(jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
        v = jnp.zeros(3)
        r_good = imu_residual(p, v, p, v, jnp.zeros(6), data, 9.81, I9)
        r_bad = imu_residual(
            p, v, Pose3(p.quat, jnp.array([1.0, 0, 0])), v, jnp.zeros(6), data, 9.81, I9
        )
        assert float(jnp.linalg.norm(r_good)) < 1e-4
        assert float(jnp.linalg.norm(r_bad)) > 0.5


class TestDvlStereoPriors:
    cam = StereoCamera.from_config(CameraConfig())

    def test_dvl_zero_at_truth(self):
        q = so3_exp(jnp.array([0.2, -0.1, 0.4]))
        pose = Pose3(q, jnp.zeros(3))
        v_world = jnp.array([0.5, -0.2, 0.1])
        from uslam_tpu.geometry.so3 import quat_conjugate, quat_rotate

        v_body = quat_rotate(quat_conjugate(q), v_world)
        r = dvl_residual(pose, v_world, v_body, 0.1)
        np.testing.assert_allclose(np.asarray(r), np.zeros(3), atol=1e-5)

    def test_dvl_jacobian_matches_fd(self):
        from uslam_tpu.geometry.se3 import pose_retract

        pose = Pose3(so3_exp(jnp.array([0.1, 0.2, -0.3])), jnp.array([1.0, 2.0, 3.0]))
        vel = jnp.array([0.3, 0.1, -0.2])
        meas = jnp.array([0.2, 0.0, 0.1])

        def fn(d):
            return dvl_residual(pose_retract(pose, d[:6]), vel + d[6:], meas, 0.1)

        J = jax.jacfwd(fn)(jnp.zeros(9))
        eps = 1e-4
        for k in range(9):
            e = jnp.zeros(9).at[k].set(eps)
            fd = (fn(e) - fn(-e)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd), atol=1e-2)

    def test_stereo_zero_at_truth(self):
        pose = Pose3(so3_exp(jnp.array([0.0, 0.1, 0.0])), jnp.array([0.5, -0.2, 0.0]))
        lm = jnp.array([1.0, 0.5, 8.0])
        meas = stereo_project(self.cam, pose_transform_point_inverse(pose, lm))
        r = stereo_residual(self.cam, pose, lm, meas, 10.0)
        np.testing.assert_allclose(np.asarray(r), np.zeros(3), atol=1e-5)

    def test_prior_pose_zero_and_sign(self):
        p = Pose3(so3_exp(jnp.array([0.1, 0.0, 0.0])), jnp.array([1.0, 2.0, 3.0]))
        sig = jnp.ones(6)
        np.testing.assert_allclose(
            np.asarray(prior_pose_residual(p, p, sig)), np.zeros(6), atol=1e-6
        )
        p2 = Pose3(p.quat, p.trans + jnp.array([0.1, 0, 0]))
        r = prior_pose_residual(p2, p, sig)
        assert float(jnp.linalg.norm(r)) > 0.05


class TestDepth:
    def test_roundtrip_with_synthetic(self):
        cfg = PressureConfig()
        depth = -3.7
        press_pa = depth * cfg.water_density * cfg.gravity + cfg.atm_pressure_pa
        got = float(pressure_to_depth(press_pa / 100.0, cfg))
        np.testing.assert_allclose(got, depth, rtol=1e-6)

    def test_reference_constants(self):
        # batch.py:122-126: depth = (mbar*100 - 98250) / (997*9.81)
        got = float(pressure_to_depth(1000.0))
        np.testing.assert_allclose(got, (100000.0 - 98250.0) / (997 * 9.81), rtol=1e-6)


def test_synthetic_sequence_consistency():
    """Generator self-check: features triangulate back to landmarks, DVL
    matches R^T v, pressure recovers z."""
    seq = generate_synthetic_sequence(SyntheticSpec(duration=4.0))
    assert len(seq.features) == len(seq.dvl_pose_t)
    cfg = PressureConfig()
    depth = (seq.pressure_mbar * 100 - cfg.atm_pressure_pa) / (cfg.water_density * cfg.gravity)
    np.testing.assert_allclose(depth, seq.gt_pos[:, 2], atol=1e-9)
    # A few frames have features.
    assert sum(len(f.ids) for f in seq.features) > 20
