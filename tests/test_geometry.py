"""Geometry unit tests, cross-checked against scipy.spatial.transform.

These are the GTSAM-geometry oracles the reference never had
(SURVEY.md §4 — reference has no tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from uslam_tpu.geometry import (
    Pose3,
    matrix_to_quat,
    normalized_to_pixels,
    pose_between,
    pose_compose,
    pose_inverse,
    pose_local,
    pose_retract,
    pose_transform_point,
    pose_transform_point_inverse,
    project_world_point,
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
    se3_exp,
    se3_log,
    so3_exp,
    so3_left_jacobian,
    so3_left_jacobian_inverse,
    so3_log,
    StereoCamera,
    stereo_backproject,
    stereo_project,
    triangulate_stereo,
)
from uslam_tpu.config import CameraConfig

RNG = np.random.default_rng(0)


def random_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = RNG.normal(size=shape)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.where(q[..., :1] < 0, -q, q), jnp.float32)


def scipy_quat_to_wxyz(r):
    x, y, z, w = r.as_quat()
    return np.array([w, x, y, z])


class TestSO3:
    def test_quat_to_matrix_vs_scipy(self):
        for _ in range(10):
            q = np.asarray(random_quat())
            r = R.from_quat([q[1], q[2], q[3], q[0]])
            np.testing.assert_allclose(
                np.asarray(quat_to_matrix(jnp.asarray(q))), r.as_matrix(), atol=1e-5
            )

    def test_matrix_quat_roundtrip(self):
        q = random_quat(64)
        q2 = matrix_to_quat(quat_to_matrix(q))
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        q = random_quat(32)
        v = jnp.asarray(RNG.normal(size=(32, 3)), jnp.float32)
        out = quat_rotate(q, v)
        out_m = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), atol=1e-5)

    def test_quat_multiply_vs_scipy(self):
        q1, q2 = np.asarray(random_quat()), np.asarray(random_quat())
        r = R.from_quat([q1[1], q1[2], q1[3], q1[0]]) * R.from_quat(
            [q2[1], q2[2], q2[3], q2[0]]
        )
        got = np.asarray(quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
        want = scipy_quat_to_wxyz(r)
        if got[0] * want[0] < 0:
            want = -want
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_exp_log_roundtrip(self):
        # Keep |w| < pi: beyond that log(exp(w)) correctly wraps.
        w = RNG.normal(size=(64, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * RNG.uniform(0, 3.0, (64, 1))
        w = jnp.asarray(w, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-4
        )

    def test_exp_vs_scipy(self):
        w = RNG.normal(size=3)
        got = np.asarray(quat_to_matrix(so3_exp(jnp.asarray(w, jnp.float32))))
        np.testing.assert_allclose(got, R.from_rotvec(w).as_matrix(), atol=1e-5)

    def test_exp_log_small_angle(self):
        w = jnp.asarray([[0.0, 0.0, 0.0], [1e-6, -1e-6, 1e-7]], jnp.float32)
        out = so3_log(so3_exp(w))
        np.testing.assert_allclose(np.asarray(out), np.asarray(w), atol=1e-7)

    def test_exp_gradient_finite_at_zero(self):
        J = jax.jacfwd(lambda w: so3_exp(w))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(J)))
        J2 = jax.jacfwd(lambda q: so3_log(q))(jnp.array([1.0, 0, 0, 0]))
        assert np.all(np.isfinite(np.asarray(J2)))

    def test_left_jacobian_inverse(self):
        w = jnp.asarray(RNG.normal(size=(16, 3)), jnp.float32)
        JJinv = so3_left_jacobian(w) @ so3_left_jacobian_inverse(w)
        np.testing.assert_allclose(
            np.asarray(JJinv), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
        )


class TestSE3:
    def rand_pose(self):
        return Pose3(random_quat(), jnp.asarray(RNG.normal(size=3), jnp.float32))

    def test_compose_inverse(self):
        p = self.rand_pose()
        ident = pose_compose(p, pose_inverse(p))
        np.testing.assert_allclose(np.asarray(ident.trans), np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(
            np.abs(np.asarray(ident.quat)[0]), 1.0, atol=1e-5
        )

    def test_transform_point_roundtrip(self):
        p = self.rand_pose()
        x = jnp.asarray(RNG.normal(size=3), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(pose_transform_point_inverse(p, pose_transform_point(p, x))),
            np.asarray(x),
            atol=1e-5,
        )

    def test_se3_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 6)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(se3_log(se3_exp(xi))), np.asarray(xi), atol=1e-4
        )

    def test_retract_local_roundtrip(self):
        a = self.rand_pose()
        xi = jnp.asarray(0.3 * RNG.normal(size=6), jnp.float32)
        b = pose_retract(a, xi)
        np.testing.assert_allclose(np.asarray(pose_local(a, b)), np.asarray(xi), atol=1e-5)

    def test_between(self):
        a, b = self.rand_pose(), self.rand_pose()
        ab = pose_compose(a, pose_between(a, b))
        np.testing.assert_allclose(np.asarray(ab.trans), np.asarray(b.trans), atol=1e-5)


class TestCamera:
    cam = StereoCamera.from_config(CameraConfig())

    def test_project_backproject_roundtrip(self):
        p = jnp.asarray(
            np.stack(
                [
                    RNG.uniform(-2, 2, 64),
                    RNG.uniform(-1, 1, 64),
                    RNG.uniform(1, 20, 64),
                ],
                axis=-1,
            ),
            jnp.float32,
        )
        meas = stereo_project(self.cam, p)
        p2 = stereo_backproject(self.cam, meas)
        # fx==fy would make this exact; with the reference's f_mean mix the
        # error is bounded by |fx-fy|/fx ~ 3e-4 relative.
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), rtol=2e-3, atol=1e-3)

    def test_disparity_sign(self):
        p = jnp.array([0.0, 0.0, 5.0])
        m = stereo_project(self.cam, p)
        # uL > uR for a point in front (positive disparity uL-uR).
        assert float(m[0]) > float(m[1])
        d = float(m[0] - m[1])
        np.testing.assert_allclose(
            d, float(self.cam.fx * self.cam.baseline / 5.0), rtol=1e-5
        )

    def test_triangulate_world(self):
        pose = Pose3(
            so3_exp(jnp.array([0.1, -0.2, 0.3])), jnp.array([1.0, 2.0, -3.0])
        )
        p_world = jnp.array([2.0, 1.0, 4.0])
        p_cam = pose_transform_point_inverse(pose, p_world)
        meas = stereo_project(self.cam, p_cam)
        got = triangulate_stereo(self.cam, pose, meas)
        np.testing.assert_allclose(np.asarray(got), np.asarray(p_world), atol=2e-2)

    def test_project_world_point_zero_at_gt(self):
        pose = Pose3(so3_exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([0.5, 0.0, 0.0]))
        p_world = jnp.array([0.3, -0.2, 6.0])
        meas = project_world_point(self.cam, pose, p_world)
        p_cam = pose_transform_point_inverse(pose, p_world)
        np.testing.assert_allclose(
            np.asarray(meas), np.asarray(stereo_project(self.cam, p_cam)), atol=1e-5
        )

    def test_normalized_to_pixels_reference_formula(self):
        # reference batch.py:152-154
        out = np.asarray(normalized_to_pixels(0.0, 0.0, 0.5, 0.0, 1920, 1080))
        np.testing.assert_allclose(out, [960.0, 1440.0, 540.0])
