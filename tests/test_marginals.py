"""Marginal covariance recovery vs a dense-inverse oracle.

GTSAM ``Marginals`` parity (SURVEY.md C19 — the engine capability at
reference batch.py:337): the Schur-based selected-column recovery in
solvers/marginals.py must reproduce the corresponding blocks of the full
dense inverse of the (floored) normal equations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, LM_DIM, POSE_DIM, VEL_DIM
from uslam_tpu.solvers.dense import assemble_dense_with_landmarks
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.solvers.marginals import marginal_covariances, marginal_sigmas

from tests.test_solver import build_graph


@pytest.fixture(scope="module")
def graph_seed3():
    """Shared problem for the two f64 dense-inverse oracle tests (the
    graph build is a Python keyframe loop — ~10 s each on this box)."""
    return build_graph(duration=3.0, drift=0.02, feature_noise=0.2, seed=3)


def _to_f64(tree):
    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else jnp.asarray(x),
        tree,
    )


def _dense_cov_oracle(slam, graph, values):
    """inv(H + 1e-8 I) over the full interleaved tangent layout, f64.

    The 1e-8 absolute floor matches the vestigial floors the production
    assembly applies (assemble_cam_bands / landmark_elimination).
    """
    cfg = slam.config
    lin = linearize_graph(
        graph, values, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
        cfg.imu.gravity,
    )
    H, _g = assemble_dense_with_landmarks(
        lin, graph.stereo.cam_idx, graph.stereo.lm_idx,
        values.num_poses, values.num_landmarks,
    )
    H = np.asarray(H, np.float64)
    return np.linalg.inv(H + 1e-8 * np.eye(H.shape[0]))


def test_marginals_match_dense_inverse_f64(graph_seed3):
    slam, graph, initial, _ = graph_seed3
    n, m = initial.num_poses, initial.num_landmarks
    poses = (0, 1, n - 1)
    vels = (0, n - 2)
    # Pick landmarks that actually carry observations (first real ids).
    lm_counts = np.asarray(graph.stereo.lm_obs_mask).sum(axis=1)
    lms = tuple(int(j) for j in np.nonzero(lm_counts > 0)[0][:3])

    with jax.enable_x64():
        graph64, init64 = _to_f64(graph), _to_f64(initial)
        out = marginal_covariances(
            graph64, init64, slam.cam,
            slam.config.noise.dvl_sigma, slam.config.noise.stereo_sigma,
            slam.config.imu.gravity,
            pose_indices=poses, vel_indices=vels, landmark_indices=lms,
            include_bias=True, jitter=0.0, refine_iters=2,
        )
        Sigma = _dense_cov_oracle(slam, graph64, init64)

    lm_base = FRAME_DIM * n + BIAS_DIM
    for a, i in enumerate(poses):
        ref = Sigma[FRAME_DIM * i : FRAME_DIM * i + POSE_DIM,
                    FRAME_DIM * i : FRAME_DIM * i + POSE_DIM]
        np.testing.assert_allclose(
            np.asarray(out.pose[a]), ref, rtol=1e-6, atol=1e-9
        )
    for a, i in enumerate(vels):
        off = FRAME_DIM * i + POSE_DIM
        ref = Sigma[off : off + VEL_DIM, off : off + VEL_DIM]
        np.testing.assert_allclose(
            np.asarray(out.vel[a]), ref, rtol=1e-6, atol=1e-9
        )
    boff = FRAME_DIM * n
    np.testing.assert_allclose(
        np.asarray(out.bias),
        Sigma[boff : boff + BIAS_DIM, boff : boff + BIAS_DIM],
        rtol=1e-6, atol=1e-9,
    )
    for a, j in enumerate(lms):
        off = lm_base + LM_DIM * j
        ref = Sigma[off : off + LM_DIM, off : off + LM_DIM]
        np.testing.assert_allclose(
            np.asarray(out.landmark[a]), ref, rtol=1e-6, atol=1e-9
        )


def test_marginals_pipeline_surface():
    """The public API path (f64 host recovery — f32 selected-column solves
    ride the weakly-observable modes and are unusable, the same accuracy
    wall the f64-polish tail addresses): finite, symmetric PD blocks that
    match the dense-inverse oracle at the solution."""
    slam, graph, initial, _ = build_graph(duration=3.0, drift=0.02,
                                          feature_noise=0.2, seed=4)
    result = slam.solve()
    out = slam.marginals(
        result, pose_indices=(0, 5), landmark_indices=(0,), include_bias=True
    )

    p0 = np.asarray(out.pose[0], np.float64)
    assert np.isfinite(p0).all()
    np.testing.assert_allclose(p0, p0.T, atol=1e-12)
    assert (np.linalg.eigvalsh(p0) > 0).all()
    # Pose-0 prior sigmas are [0.1 x3 rot, 0.3 x3 trans]. At the prior
    # MEAN the marginal could not exceed these; at the solved estimate the
    # SE3 log-Jacobian of the prior residual mixes axes, so only a loose
    # same-order bound holds (measured ~0.36 max on this sequence).
    sig = marginal_sigmas(out.pose)[0]
    assert (sig[:3] <= 0.2).all()
    assert (sig[3:] <= 0.5).all()
    assert (sig > 1e-4).all()

    with jax.enable_x64():
        graph64, vals64 = _to_f64(result.graph), _to_f64(result.values)
        Sigma = _dense_cov_oracle(slam, graph64, vals64)
    n = result.values.num_poses
    for a, i in enumerate((0, 5)):
        ref = Sigma[FRAME_DIM * i : FRAME_DIM * i + POSE_DIM,
                    FRAME_DIM * i : FRAME_DIM * i + POSE_DIM]
        np.testing.assert_allclose(
            np.asarray(out.pose[a]), ref, rtol=1e-6, atol=1e-9
        )
    lm0 = FRAME_DIM * n + BIAS_DIM
    np.testing.assert_allclose(
        np.asarray(out.landmark[0]),
        Sigma[lm0 : lm0 + LM_DIM, lm0 : lm0 + LM_DIM],
        rtol=1e-6, atol=1e-9,
    )

    # Joint-marginal public surface at the same solved estimate (the f64
    # cross-block algebra is pinned against the dense-inverse oracle in
    # test_joint_marginals_match_dense_inverse_f64).
    J2 = np.asarray(slam.joint_marginals(
        result, (("pose", 0), ("pose", 5), ("bias",), ("landmark", 0))
    ))
    assert J2.shape == (21, 21)
    assert np.isfinite(J2).all()
    np.testing.assert_allclose(J2, J2.T, atol=1e-12)


def test_marginals_f32_smoke():
    """The raw f32 device path stays runnable (finite output) — accuracy
    is an f64 story by design. duration 1.5: smoke only needs the f32
    program to compile and stay finite, and this shape's compile+run was
    ~114 s at duration 3.0."""
    slam, graph, initial, _ = build_graph(duration=1.5, seed=5)
    out = marginal_covariances(
        graph, initial, slam.cam,
        slam.config.noise.dvl_sigma, slam.config.noise.stereo_sigma,
        slam.config.imu.gravity, pose_indices=(0,),
    )
    assert np.isfinite(np.asarray(out.pose)).all()


def test_joint_marginals_match_dense_inverse_f64(graph_seed3):
    """jointMarginalCovariance parity: the full joint covariance over a
    mixed key set (poses, vel, bias, landmarks) must reproduce the
    corresponding rows/columns of the dense inverse — including the CROSS
    blocks (cam-cam, cam-landmark, landmark-landmark) that the
    per-variable recovery never exercises."""
    from uslam_tpu.solvers.marginals import joint_marginal_covariance

    slam, graph, initial, _ = graph_seed3
    n = initial.num_poses
    lm_counts = np.asarray(graph.stereo.lm_obs_mask).sum(axis=1)
    lms = [int(j) for j in np.nonzero(lm_counts > 0)[0][:2]]
    keys = (
        ("pose", 0), ("pose", n - 1), ("vel", 1), ("bias",),
        ("landmark", lms[0]), ("landmark", lms[1]),
    )

    with jax.enable_x64():
        graph64, init64 = _to_f64(graph), _to_f64(initial)
        J = np.asarray(joint_marginal_covariance(
            graph64, init64, slam.cam,
            slam.config.noise.dvl_sigma, slam.config.noise.stereo_sigma,
            slam.config.imu.gravity, keys, jitter=0.0, refine_iters=2,
        ))
        Sigma = _dense_cov_oracle(slam, graph64, init64)

    # Oracle rows/cols in the interleaved dense layout, in request order.
    lm_base = FRAME_DIM * n + BIAS_DIM
    idx = np.concatenate([
        np.arange(FRAME_DIM * 0, FRAME_DIM * 0 + POSE_DIM),
        np.arange(FRAME_DIM * (n - 1), FRAME_DIM * (n - 1) + POSE_DIM),
        np.arange(FRAME_DIM * 1 + POSE_DIM, FRAME_DIM * 1 + POSE_DIM + VEL_DIM),
        np.arange(FRAME_DIM * n, FRAME_DIM * n + BIAS_DIM),
        np.arange(lm_base + LM_DIM * lms[0], lm_base + LM_DIM * lms[0] + LM_DIM),
        np.arange(lm_base + LM_DIM * lms[1], lm_base + LM_DIM * lms[1] + LM_DIM),
    ])
    ref = Sigma[np.ix_(idx, idx)]
    assert J.shape == ref.shape == (27, 27)
    np.testing.assert_allclose(J, ref, rtol=1e-6, atol=1e-9)

    # The cross blocks are genuinely nonzero (the joint adds information
    # beyond the per-variable diagonal blocks).
    assert np.abs(J[:POSE_DIM, POSE_DIM : 2 * POSE_DIM]).max() > 1e-6
    assert np.abs(J[:POSE_DIM, -LM_DIM:]).max() > 1e-6
    # (The slam.joint_marginals public surface at a solved estimate is
    # covered in test_marginals_pipeline_surface, which already pays for
    # a full slam.solve(); duplicating the solve here cost ~30 s/run.)
