"""Solver tests (SURVEY.md §4 config 3): dense GN vs Schur equivalence and
LM convergence to ground truth on synthetic sequences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uslam_tpu.config import SolverConfig, UslamConfig
from uslam_tpu.eval.metrics import ate_rmse
from uslam_tpu.geometry.camera import StereoCamera
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.pipeline import AUVSlam, run_sequence, run_solver
from uslam_tpu.solvers.dense import assemble_dense_with_landmarks, solve_dense_gn
from uslam_tpu.solvers.linearize import graph_error, linearize_graph
from uslam_tpu.solvers.polish import polish_f64
from uslam_tpu.solvers.schur import solve_schur


def build_graph(duration=6.0, seed=0, drift=0.0, feature_noise=0.0):
    """Synthetic sequence -> accumulated graph via the public pipeline API."""
    spec = SyntheticSpec(
        duration=duration,
        seed=seed,
        odom_drift_rate=drift,
        feature_noise_px=feature_noise,
        num_landmarks=80,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig()
    slam = AUVSlam(cfg)
    prev_t = None
    from uslam_tpu.factors.depth import pressure_to_depth
    from uslam_tpu.io.timesync import slice_stream

    for i, t in enumerate(seq.dvl_pose_t):
        depth = float(pressure_to_depth(seq.pressure_mbar[i], cfg.pressure))
        sl = slice_stream(seq.imu_t, prev_t if prev_t is not None else -np.inf, t)
        for k in range(sl.start, sl.stop):
            slam.update_imu(seq.imu_acc[k], seq.imu_gyro[k], 0.005)
        prev_t = float(t)
        ff = seq.features[i]
        slam.batch_update(
            seq.dvl_pose_quat[i],
            seq.dvl_pose_pos[i],
            seq.dvl_twist_vel[i],
            depth,
            (ff.ids, ff.u0, ff.v0, ff.u1, ff.v1),
        )
    graph, initial = slam.batch_create()
    return slam, graph, initial, seq


class TestLinearSolvers:
    def test_schur_matches_dense(self):
        slam, graph, initial, _ = build_graph(duration=3.0)
        cfg = slam.config
        lin = linearize_graph(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity,
        )
        H, g = assemble_dense_with_landmarks(
            lin, graph.stereo.cam_idx, graph.stereo.lm_idx,
            initial.num_poses, initial.num_landmarks,
        )
        # Tiny damping: just assert well-posedness (flat-direction f32 noise
        # makes the two paths differ there by design).
        d_schur_tiny = np.asarray(
            solve_schur(lin, graph.stereo, initial.num_poses, initial.num_landmarks, 1e-3)
        )
        assert not np.isnan(d_schur_tiny).any()
        # Moderate damping: the paths must agree. Absolute lambda=0.1 is
        # tiny next to the ~1e6 diagonal, so both paths pin the strongly
        # regularized solve (jitter 1e-6, 3 refinement passes): the
        # production low-jitter solve recovers weakly-observable modes whose
        # content is f32 summation-order noise, which differs between the
        # two assembly orders by design.
        lam = 0.1
        d_dense = np.asarray(solve_dense_gn(H, g, lam, refine_iters=3, jitter=1e-6))
        d_schur = np.asarray(
            solve_schur(
                lin, graph.stereo, initial.num_poses, initial.num_landmarks, lam,
                refine_iters=3, jitter=1e-6,
            )
        )
        assert not np.isnan(d_dense).any() and not np.isnan(d_schur).any()
        rel = np.linalg.norm(d_schur - d_dense) / max(np.linalg.norm(d_dense), 1e-9)
        # f32 summation-order noise on a moderately conditioned system
        # (observed 0.03-0.13 across assembly formulations) — structural
        # agreement is what matters here; EXACT equivalence of the two
        # elimination paths is proven in f64 by
        # TestBandAssembly::test_schur_equals_dense_f64.
        assert rel < 0.25, rel

    def test_cg_matches_cholesky(self):
        slam, graph, initial, _ = build_graph(duration=3.0)
        cfg = slam.config
        lin = linearize_graph(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity,
        )
        # Compare at healthy damping: f32 CG stagnates at ~1e-4 relative
        # residual, so on the raw ill-conditioned system the flat directions
        # differ; at lambda=10 the system is benign and both must agree.
        d_chol = np.asarray(
            solve_schur(lin, graph.stereo, initial.num_poses, initial.num_landmarks, 10.0)
        )
        d_cg = np.asarray(
            solve_schur(
                lin, graph.stereo, initial.num_poses, initial.num_landmarks, 10.0,
                cg=True, cg_iters=1000, cg_tol=1e-9,
            )
        )
        assert not np.isnan(d_chol).any() and not np.isnan(d_cg).any()
        rel = np.linalg.norm(d_cg - d_chol) / max(np.linalg.norm(d_chol), 1e-9)
        # Structural agreement in f32 (observed 0.03-0.07 across assembly
        # formulations; CG stagnates at its f32 noise floor while Cholesky+
        # refinement lands elsewhere within it). Exact-math equivalence of
        # the assembly paths is pinned in f64 by TestBandAssembly.
        assert rel < 0.12, rel


def _random_linearization(rng, n, m, K):
    """Random but structurally consistent Linearization + StereoObservations
    (masked entries zeroed, as linearize_graph guarantees)."""
    from uslam_tpu.graph.builder import StereoObservations
    from uslam_tpu.solvers.linearize import Linearization

    F = m * K
    cam_idx = rng.integers(1, n, F).astype(np.int32)
    lm_idx = np.repeat(np.arange(m), K).astype(np.int32)
    lm_obs_idx = np.arange(F, dtype=np.int32).reshape(m, K)
    lm_obs_mask = np.ones((m, K))
    mask = np.ones(F)
    for f in (3, 11):  # exercise the padding path
        mask[f] = 0.0
        lm_obs_mask[f // K, f % K] = 0.0
    r = lambda *s: jnp.asarray(rng.normal(0, 1, s))
    lin = Linearization(
        prior_pose_r=r(6), prior_pose_J=r(6, 6),
        prior_vel_r=r(3), prior_vel_J=r(3, 3),
        prior_bias_r=r(6), prior_bias_J=r(6, 6),
        marg_r=r(15), marg_J=r(15, 15),
        imu_r=r(n - 1, 9),
        imu_J_pose_i=r(n - 1, 9, 6), imu_J_vel_i=r(n - 1, 9, 3),
        imu_J_pose_j=r(n - 1, 9, 6), imu_J_vel_j=r(n - 1, 9, 3),
        imu_J_bias=r(n - 1, 9, 6),
        dvl_r=r(n, 3), dvl_J_pose=r(n, 3, 6), dvl_J_vel=r(n, 3, 3),
        stereo_r=r(F, 3) * mask[:, None],
        stereo_J_pose=r(F, 3, 6) * mask[:, None, None],
        stereo_J_lm=r(F, 3, 3) * mask[:, None, None],
    )
    stereo = StereoObservations(
        cam_idx=jnp.asarray(cam_idx), lm_idx=jnp.asarray(lm_idx),
        meas=jnp.zeros((F, 3)), mask=jnp.asarray(mask),
        lm_obs_idx=jnp.asarray(lm_obs_idx), lm_obs_mask=jnp.asarray(lm_obs_mask),
    )
    return lin, stereo


class TestBandAssembly:
    """The scatter-free band assembly (solvers/bands.py) must reproduce the
    scatter-based dense assembly EXACTLY (same math, different ops) — checked
    in f64 where there is no rounding slack to hide behind."""

    def test_bands_equal_scatter_f64(self):
        from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, POSE_DIM
        from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense
        from uslam_tpu.solvers.dense import assemble_dense, scatter_H, scatter_g

        with jax.enable_x64():
            rng = np.random.default_rng(1)
            n, m, K = 7, 5, 4
            lin, stereo = _random_linearization(rng, n, m, K)
            lam = 0.37
            Dc = FRAME_DIM * n + BIAS_DIM
            H_cc, g_c, _ = assemble_dense(lin, n, 0, pose_major=True)
            p_off = POSE_DIM * stereo.cam_idx
            Jp, r = lin.stereo_J_pose, lin.stereo_r
            H_cc = scatter_H(H_cc, p_off, p_off, jnp.einsum("fda,fdb->fab", Jp, Jp))
            g_c = scatter_g(g_c, p_off, -jnp.einsum("fda,fd->fa", Jp, r))
            H_ref = H_cc + (lam + 1e-8) * jnp.eye(Dc, dtype=H_cc.dtype)
            H_new, g_new = expand_cam_dense(assemble_cam_bands(lin, stereo, n, lam))
            np.testing.assert_allclose(np.asarray(H_new), np.asarray(H_ref), atol=1e-12)
            np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_c), atol=1e-12)

    def test_inv3x3_matches_lu_inverse(self):
        """The closed-form adjugate 3x3 inverse (solvers/dense.py::inv3x3,
        the landmark-elimination hot path — batched LU `linalg.inv`
        measures ~25 ms/call on TPU independent of batch size) must match
        `jnp.linalg.inv` to f64 rounding on damped SPD blocks, including
        the near-singular padded-landmark case (Hll = 1e-8 I)."""
        from uslam_tpu.solvers.dense import inv3x3

        with jax.enable_x64():
            rng = np.random.default_rng(7)
            J = rng.standard_normal((64, 5, 3))
            A = np.einsum("mkd,mke->mde", J, J) + 1e-8 * np.eye(3)
            A[0] = 1e-8 * np.eye(3)  # padded landmark: damping floor only
            X_adj = np.asarray(inv3x3(jnp.asarray(A)))
            X_lu = np.linalg.inv(A)
            np.testing.assert_allclose(X_adj, X_lu, rtol=1e-9, atol=1e-9)
            # f32: agreement within batched-LU's own f32 rounding envelope,
            # INCLUDING the padded-landmark block A[0] = 1e-8 I (det 1e-24
            # stays representable — f32 subnormal floor is ~1e-45; its
            # inverse is 1e8 I, so compare relative to the magnitude).
            X32 = np.asarray(inv3x3(jnp.asarray(A, jnp.float32)))
            rel = np.abs(X32 - X_lu) / (np.abs(X_lu) + 1e-3 * np.abs(X_lu).max(axis=(-2, -1), keepdims=True))
            assert rel.max() < 5e-3, rel.max()
            assert np.isfinite(X32).all()

    def test_schur_equals_dense_f64(self):
        with jax.enable_x64():
            rng = np.random.default_rng(2)
            n, m, K = 7, 5, 4
            lin, stereo = _random_linearization(rng, n, m, K)
            lam = 0.37
            H, g = assemble_dense_with_landmarks(lin, stereo.cam_idx, stereo.lm_idx, n, m)
            d_dense = np.asarray(solve_dense_gn(H, g, lam))
            d_schur = np.asarray(solve_schur(lin, stereo, n, m, lam))
            rel = np.linalg.norm(d_schur - d_dense) / np.linalg.norm(d_dense)
            assert rel < 1e-7, rel

    def test_velocity_elimination_equals_full_f64(self):
        """The velocity-chain elimination (solvers.schur._solve_vel_eliminated)
        is a pure reformulation: in f64 it must reproduce the full
        reduced-camera solve to rounding, including the return_aux g.delta."""
        with jax.enable_x64():
            rng = np.random.default_rng(5)
            n, m, K = 7, 5, 4
            lin, stereo = _random_linearization(rng, n, m, K)
            for lam, dd in [(0.37, False), (1e-3, True)]:
                d0, a0 = solve_schur(
                    lin, stereo, n, m, lam, return_aux=True, diag_damping=dd
                )
                d1, a1 = solve_schur(
                    lin, stereo, n, m, lam, return_aux=True, diag_damping=dd,
                    eliminate_velocities=True,
                )
                rel = np.linalg.norm(np.asarray(d1) - np.asarray(d0)) / np.linalg.norm(
                    np.asarray(d0)
                )
                assert rel < 1e-8, (lam, dd, rel)
                assert abs(float(a1) - float(a0)) < 1e-6 * abs(float(a0))

    def test_block_tridiag_solvers_f64(self):
        """Thomas scan and Spike (partitioned) block-tridiagonal solvers
        against a dense oracle."""
        from uslam_tpu.solvers.tridiag import (
            block_tridiag_solve,
            block_tridiag_solve_spike,
        )

        with jax.enable_x64():
            rng = np.random.default_rng(1)
            N, d, K = 33, 3, 5
            diag = np.stack(
                [np.eye(d) * 5 + a @ a.T * 0.3 for a in rng.normal(size=(N, d, d))]
            )
            off = rng.normal(size=(N - 1, d, d)) * 0.5
            rhs = rng.normal(size=(N, d, K))
            A = np.zeros((N * d, N * d))
            for k in range(N):
                A[k * d : (k + 1) * d, k * d : (k + 1) * d] = diag[k]
            for k in range(N - 1):
                A[k * d : (k + 1) * d, (k + 1) * d : (k + 2) * d] = off[k]
                A[(k + 1) * d : (k + 2) * d, k * d : (k + 1) * d] = off[k].T
            x_ref = np.linalg.solve(A, rhs.reshape(N * d, K))
            for solver in (
                block_tridiag_solve,
                lambda D, O, R: block_tridiag_solve_spike(D, O, R, chunk=8),
            ):
                x = np.asarray(
                    solver(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(rhs))
                ).reshape(N * d, K)
                rel = np.abs(x - x_ref).max() / np.abs(x_ref).max()
                assert rel < 1e-12, rel


class TestLM:
    def test_converges_on_clean_data(self):
        """Noise-free measurements, noisy initialization: LM should land on
        the ground truth (config 3 oracle)."""
        slam, graph, initial, seq = build_graph(duration=6.0, drift=0.05)
        cfg = slam.config
        n = initial.num_poses
        init_ate = ate_rmse(np.asarray(initial.pose_trans), seq.gt_pos[:n])
        values, stats = run_solver(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity, cfg.solver,
        )
        final_ate = ate_rmse(np.asarray(values.pose_trans), seq.gt_pos[:n])
        assert float(stats.final_error) < float(stats.initial_error)
        assert final_ate < init_ate * 0.6, (init_ate, final_ate)
        # f32 envelope, NOT a quality pin: this clean problem's f64-exact
        # optimum is ATE 0.0267, and the f32 LM floor lands 0.10-0.14
        # depending on pure reduction-order luck (measured: swapping the
        # batched-LU Hll inverse for the Newton-refined cofactor inv3x3 —
        # residual 1e-7, numerically equivalent — moved it 0.11 -> 0.125).
        # Real solution quality is pinned through the f64 polish below.
        assert final_ate < 0.18, final_ate
        # QUALITY pin: the f64 polish tail from the f32 solution must land
        # near the f64-exact optimum (0.0267 for this seed; 2x headroom).
        # This is the accuracy contract the f32 envelope above cannot hold.
        pv, _ = polish_f64(
            graph, values, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity, cfg.solver,
        )
        polished_ate = ate_rmse(np.asarray(pv.pose_trans), seq.gt_pos[:n])
        assert polished_ate < 0.055, polished_ate
        # Regression lock on linear-solve step quality + stopping policy:
        # with accurate steps (refine_iters=10, jitter=1e-7) and the
        # progress-band plateau, LM stops in <=20 iterations; degraded
        # steps (the old 1e-6 jitter / 3 refinement passes) crawl along
        # weakly-observable modes for 25+ outer iterations, and GTSAM-strict
        # stopping burns ~20 more at the f32 floor (tools/solver_lab.py,
        # tools/lm_trace.py).
        assert int(stats.iterations) <= 35, int(stats.iterations)

    def test_dense_solver_agrees(self):
        slam, graph, initial, seq = build_graph(duration=3.0, drift=0.03, seed=3)
        cfg = slam.config
        # Structural-agreement test (dense vs Schur elimination): both runs
        # pin the strongly regularized solve so the comparison isn't
        # dominated by weakly-observable modes whose content is f32 noise
        # (differs between assembly orders by design; see
        # test_schur_matches_dense).
        pinned = dict(max_iterations=30, refine_iters=3, cholesky_jitter=1e-6)
        dense_cfg = SolverConfig(linear_solver="dense", **pinned)
        v1, s1 = run_solver(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity, dense_cfg,
        )
        v2, s2 = run_solver(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity, SolverConfig(**pinned),
        )
        # Both reach the same basin; f32 + different elimination orders leave
        # cm-level differences in weakly observable directions.
        np.testing.assert_allclose(
            np.asarray(v1.pose_trans), np.asarray(v2.pose_trans), atol=8e-2
        )

    def test_error_decreases_with_noise(self):
        slam, graph, initial, seq = build_graph(
            duration=4.0, drift=0.05, feature_noise=0.5, seed=7
        )
        cfg = slam.config
        values, stats = run_solver(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity, cfg.solver,
        )
        assert np.isfinite(float(stats.final_error))
        assert float(stats.final_error) < float(stats.initial_error)


class TestRobust:
    def test_huber_suppresses_outliers(self):
        """Corrupt a few stereo measurements; Huber keeps the solution near
        clean-data quality while plain L2 degrades."""
        import jax.numpy as jnp
        from uslam_tpu.config import NoiseConfig

        slam, graph, initial, seq = build_graph(duration=4.0, seed=5)
        cfg = slam.config
        n = initial.num_poses
        # Corrupt 5 observations by 200 px.
        meas = np.asarray(graph.stereo.meas).copy()
        mask = np.asarray(graph.stereo.mask)
        idx = np.nonzero(mask)[0][:5]
        meas[idx, 0] += 200.0
        graph_bad = graph._replace(
            stereo=graph.stereo._replace(meas=jnp.asarray(meas))
        )
        v_l2, _ = run_solver(
            graph_bad, initial, slam.cam, cfg.noise.dvl_sigma,
            cfg.noise.stereo_sigma, cfg.imu.gravity, cfg.solver,
        )
        v_hub, _ = run_solver(
            graph_bad, initial, slam.cam, cfg.noise.dvl_sigma,
            cfg.noise.stereo_sigma, cfg.imu.gravity, cfg.solver,
            huber_delta=1.345,
        )
        ate_l2 = ate_rmse(np.asarray(v_l2.pose_trans), seq.gt_pos[:n])
        ate_hub = ate_rmse(np.asarray(v_hub.pose_trans), seq.gt_pos[:n])
        assert ate_hub <= ate_l2 * 1.05, (ate_l2, ate_hub)
        assert ate_hub < 0.1, ate_hub
