"""Landmark-sharded solver step vs the single-device path (8-device CPU
mesh from conftest's xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uslam_tpu.graph.values import values_retract
from uslam_tpu.parallel.mesh import make_mesh, shard_landmarks, sharded_lm_step
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.solvers.schur import solve_schur

from tests.test_solver import build_graph


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    slam, graph, initial, _ = build_graph(duration=3.0)
    cfg = slam.config
    assert initial.num_landmarks % 8 == 0  # builder buckets to powers of 2

    # Single-device GN step. This test checks SHARDING equivalence, not step
    # quality, so both paths pin a strongly regularized solve (jitter 1e-6,
    # 3 refinement passes): the production low-jitter/deep-refinement solve
    # recovers weakly-observable modes whose content is f32 summation-order
    # noise, and the psum's different reduction order makes exactly those
    # modes diverge between the two paths.
    with jax.default_matmul_precision("highest"):
        lin = linearize_graph(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity,
        )
        delta = solve_schur(
            lin, graph.stereo, initial.num_poses, initial.num_landmarks, 1.0,
            refine_iters=3, jitter=1e-6,
        )
        ref = values_retract(initial, delta)

    mesh = make_mesh(8)
    g_sh, v_sh = shard_landmarks(graph, initial, mesh)
    with jax.default_matmul_precision("highest"):
        out = sharded_lm_step(
            g_sh, v_sh, slam.cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            1.0, mesh, refine_iters=3, jitter=1e-6,
        )

    # f32 psum summation-order differences propagate through the reduced
    # solve; agreement is at the cm level, not bit level.
    np.testing.assert_allclose(
        np.asarray(out.pose_trans), np.asarray(ref.pose_trans), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.landmarks), np.asarray(ref.landmarks), atol=5e-2
    )
