"""ATE parity of the production f32 TPU solver vs an f64-exact oracle.

SURVEY.md §4 item 3 / BASELINE.json demand "ATE within 1% of GTSAM" on the
identical graph. GTSAM is not installable in this environment, so the
honest stand-in (documented in BASELINE.md) is an f64-exact LM oracle:
the SAME graph, residuals, and robust model, but with the full dense
normal equations solved in numpy float64 — no Schur complement, no
Cholesky jitter, no refinement, no damping floor. That isolates the
production path's f32/Schur/damping approximations, which is exactly what
the GTSAM comparison was meant to bound (reference batch.py:337 is a
full-precision sparse LM of the same system).
"""

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import UslamConfig
from uslam_tpu.eval.metrics import ate_rmse
from uslam_tpu.geometry.camera import StereoCamera
from uslam_tpu.graph.packing import pack_sequence
from uslam_tpu.graph.values import values_retract
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.solvers.dense import assemble_dense_with_landmarks
from uslam_tpu.solvers.linearize import graph_error, linearize_graph
from uslam_tpu.solvers.lm import optimize_lm


def _exact_f64_optimize(graph, initial, cam, cfg, max_iters=40):
    """f64-exact LM: dense numpy solve, GTSAM lambda policy, no floors."""
    kw = dict(
        cam=cam,
        dvl_sigma=cfg.noise.dvl_sigma,
        stereo_sigma=cfg.noise.stereo_sigma,
        gravity=cfg.imu.gravity,
    )
    err_fn = jax.jit(lambda v: graph_error(graph, values=v, **kw))
    lin_fn = jax.jit(lambda v: linearize_graph(graph, values=v, **kw))
    n, m = initial.num_poses, initial.num_landmarks
    assemble = jax.jit(
        lambda lin: assemble_dense_with_landmarks(
            lin, graph.stereo.cam_idx, graph.stereo.lm_idx, n, m
        )
    )
    retract = jax.jit(values_retract)

    values = initial
    error = float(err_fn(values))
    lam, nu = 1e-5, 10.0
    for _ in range(max_iters):
        H, g = assemble(lin_fn(values))
        H = np.asarray(H, np.float64)
        g = np.asarray(g, np.float64)
        delta = np.linalg.solve(H + (lam + 1e-12) * np.eye(H.shape[0]), g)
        candidate = retract(values, jnp.asarray(delta))
        new_error = float(err_fn(candidate))
        if np.isfinite(new_error) and new_error < error:
            decrease = error - new_error
            values, error = candidate, new_error
            if decrease <= 1e-8 or decrease <= 1e-6 * error:
                break
            lam, nu = max(lam / 10.0, 0.0), 10.0
        else:
            lam = max(lam, 1e-10) * nu
            nu *= 10.0
            if lam > 1e8:
                break
    return values, error


def test_ate_parity_vs_exact_oracle():
    """Production f32 solve lands within 1% ATE of the f64-exact optimum
    on a 100-pose drifting/noisy synthetic graph (config 3 / BASELINE
    'ATE within 1%' with the oracle substitution documented above)."""
    spec = SyntheticSpec(
        duration=20.0,            # 100 keyframes at 5 Hz
        keyframe_rate=5.0,
        num_landmarks=128,
        odom_drift_rate=0.05,
        feature_noise_px=0.3,
        seed=3,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig()
    cam = StereoCamera.from_config(cfg.camera)

    # Production path: f32 graph, full production policy.
    graph32, init32, _odom, _ = pack_sequence(seq, cfg, dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        prod_vals, prod_stats = jax.jit(
            lambda g, v: optimize_lm(
                g, v, cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                cfg.imu.gravity, cfg.solver,
            )
        )(graph32, init32)
    assert bool(prod_stats.converged)

    # Oracle: identical graph in f64, exact dense solves.
    with jax.enable_x64():
        graph64, init64, _odom64, _ = pack_sequence(seq, cfg, dtype=jnp.float64)
        oracle_vals, oracle_error = _exact_f64_optimize(
            graph64, init64, cam, cfg
        )
        oracle_pos = np.asarray(oracle_vals.pose_trans, np.float64)

    # Production quality tail: f64 polish from the f32 solution
    # (SolverConfig.f64_polish — the mode this test certifies).
    from uslam_tpu.solvers.polish import polish_f64

    polished_vals, polish_info = polish_f64(
        graph32, prod_vals, cam,
        cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
        cfg.solver,
    )

    n = init32.num_poses
    n_gt = min(n, len(seq.gt_pos))
    gt = np.asarray(seq.gt_pos[:n_gt], np.float64)
    ate_oracle = ate_rmse(oracle_pos[:n_gt], gt)
    ate_f32 = ate_rmse(np.asarray(prod_vals.pose_trans, np.float64)[:n_gt], gt)
    ate_polished = ate_rmse(
        np.asarray(polished_vals.pose_trans, np.float64)[:n_gt], gt
    )

    # Sanity: both beat the drifting odometry by a wide margin.
    ate_init = ate_rmse(np.asarray(init32.pose_trans, np.float64)[:n_gt], gt)
    assert ate_oracle < 0.5 * ate_init

    # Pure-f32 canary: the TPU path reaches its f32 error floor ~2-3x the
    # exact optimum's ATE (weak-mode curvature below f32 assembly
    # resolution — measured 2026-08: 0.078 vs 0.027). Regression bound,
    # not a quality claim.
    assert ate_f32 <= ate_oracle * 3.5, (ate_f32, ate_oracle)

    # THE parity bound (BASELINE "ATE within 1%"): the production
    # f64-polished estimate vs the exact optimum.
    assert ate_polished <= ate_oracle * 1.01 + 1e-4, (ate_polished, ate_oracle)


import os

import pytest


@pytest.mark.slow
def test_ate_parity_vs_exact_oracle_1k_bench_scale():
    """The 1% parity claim AT THE BENCH SCALE (1k poses, the BASELINE.json
    configuration): f32 production solve + f64 polish tail lands within 1%
    ATE of the f64 optimum on the same graph the headline bench runs.

    Slow-marked (USLAM_RUN_SLOW=1): the f64 oracle LM at 1k runs for tens
    of host-CPU minutes the first time; its solution is content-addressed
    cached under ~/.cache so re-runs only pay the production-path solve.
    The always-on 100-pose variant above pins the same property each run;
    the bench reports ate_polished on this exact spec every round.
    """
    from uslam_tpu.solvers.polish import polish_f64

    spec = SyntheticSpec(
        duration=200.0,            # 1000 keyframes at 5 Hz — the bench spec
        keyframe_rate=5.0,
        num_landmarks=512,
        omega=0.15,
        odom_drift_rate=0.02,
        feature_noise_px=0.3,
        seed=0,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    graph, initial, _odom, _ = pack_sequence(seq, cfg, dtype=jnp.float32)

    # Production path: f32 full policy + f64 polish tail.
    from uslam_tpu.pipeline import run_solver

    values, stats = run_solver(
        graph, initial, cam,
        cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
        cfg.solver,
    )
    polished, _pinfo = polish_f64(
        graph, values, cam,
        cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
        cfg.solver,
    )

    # Oracle: f64 LM from the initial estimate (exact algebra; Schur path —
    # banded==dense==exact in f64). Content-addressed cache.
    cache = os.path.join(
        os.path.expanduser("~/.cache"),
        f"uslam_oracle_1k_s{spec.seed}_m{spec.num_landmarks}"
        f"_d{int(spec.duration)}.npz",
    )
    if os.path.exists(cache):
        oracle_pos = np.load(cache)["pose_trans"]
    else:
        oracle, _oinfo = polish_f64(
            graph, initial, cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            cfg.solver, max_iters=40,
        )
        oracle_pos = np.asarray(oracle.pose_trans, np.float64)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez_compressed(cache, pose_trans=oracle_pos)

    n = initial.num_poses
    gt = np.asarray(seq.gt_pos[:n], np.float64)
    ate_oracle = ate_rmse(oracle_pos[:n], gt)
    ate_polished = ate_rmse(np.asarray(polished.pose_trans, np.float64)[:n], gt)
    ate_f32 = ate_rmse(np.asarray(values.pose_trans, np.float64)[:n], gt)

    assert ate_f32 <= ate_oracle * 3.5, (ate_f32, ate_oracle)
    assert ate_polished <= ate_oracle * 1.01 + 1e-4, (ate_polished, ate_oracle)


def test_reference_default_policy_converges():
    """The documented reference-default LM mapping (PARITY.md C11:
    damping_mode='identity', lambda_lower_bound=0, plateau_patience=0 —
    `gtsam.LevenbergMarquardtParams()` semantics at reference batch.py:337)
    reaches the f64-exact optimum inside this framework's solver, in f64
    like GTSAM itself. This certifies the *reference's policy*, not just
    the f32-tuned production policy, against the oracle."""
    import dataclasses

    spec = SyntheticSpec(
        duration=4.0,           # 20 keyframes at 5 Hz: small graph
        keyframe_rate=5.0,
        num_landmarks=32,
        odom_drift_rate=0.05,
        feature_noise_px=0.3,
        seed=7,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    ref_solver = dataclasses.replace(
        cfg.solver,
        damping_mode="identity",
        lambda_lower_bound=0.0,
        plateau_patience=0,
        max_iterations=40,
    )

    with jax.enable_x64():
        graph, initial, _odom, _ = pack_sequence(seq, cfg, dtype=jnp.float64)
        vals, stats = optimize_lm(
            graph, initial, cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity, ref_solver,
        )
        oracle_vals, oracle_error = _exact_f64_optimize(
            graph, initial, cam, cfg
        )

    assert bool(stats.converged)
    final = float(stats.final_error)
    # Same optimum as the exact dense-f64 LM (cost is the formulation-
    # independent quality number; see bench cost_vs_f64_opt). 5e-4 relative:
    # the identity-damped policy stops on GTSAM's absolute/relative decrease
    # tests with lambda not fully annealed (measured 7e-5 above the oracle).
    assert final <= oracle_error * (1.0 + 5e-4), (final, oracle_error)
    # And the trajectories agree to mm level (both are f64, but each stops
    # at a slightly different point of the same flat cost valley — measured
    # max pose difference 1.4 mm at 7e-5 relative cost difference).
    np.testing.assert_allclose(
        np.asarray(vals.pose_trans), np.asarray(oracle_vals.pose_trans),
        atol=5e-3,
    )
