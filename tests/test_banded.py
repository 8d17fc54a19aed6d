"""Banded large-N reduced-camera solver (solvers/banded.py) vs the dense
Schur path — f64 exactness-to-rounding, plus structure/memory properties.

The banded path must reproduce ``solve_schur`` (a pure reformulation) for
any graph whose track span fits the band; with band_w = N-1 that is every
graph, which pins the full algebra (landmark correction band, frame-major
assembly, panelized block-tridiagonal Thomas, bias border, refinement)
against the battle-tested dense path.
"""

import jax
import numpy as np
import pytest

from tests.test_solver import _random_linearization
from uslam_tpu.solvers.banded import (
    measure_band_width,
    solve_schur_banded,
)
from uslam_tpu.solvers.schur import solve_schur


def _windowed_linearization(rng, n, m, K, span):
    """Like _random_linearization but every landmark's observations fall in
    a window of `span` consecutive frames (bounded band width)."""
    import jax.numpy as jnp

    lin, stereo = _random_linearization(rng, n, m, K)
    starts = rng.integers(1, max(n - span, 2), m)
    cam = np.minimum(
        starts[:, None] + np.sort(rng.integers(0, span, (m, K)), axis=1),
        n - 1,
    ).astype(np.int32)
    cam_idx = np.asarray(stereo.cam_idx).copy()
    cam_idx[np.asarray(stereo.lm_obs_idx).reshape(-1)] = cam.reshape(-1)
    stereo = stereo._replace(cam_idx=jnp.asarray(cam_idx))
    return lin, stereo


class TestBandedSolver:
    def test_full_band_equals_dense_f64(self):
        """band_w = N-1: banded == dense Schur for a random (full-span)
        graph, both damping modes, incl. the return_aux g.delta."""
        with jax.enable_x64():
            rng = np.random.default_rng(7)
            n, m, K = 7, 5, 4
            lin, stereo = _random_linearization(rng, n, m, K)
            for lam, dd in [(0.37, False), (1e-3, True)]:
                d0, a0 = solve_schur(
                    lin, stereo, n, m, lam, return_aux=True, diag_damping=dd,
                    jitter=1e-12,
                )
                d1, a1 = solve_schur_banded(
                    lin, stereo, n, m, lam, band_w=n - 1, return_aux=True,
                    diag_damping=dd, jitter=1e-12, refine_iters=3,
                )
                rel = np.linalg.norm(np.asarray(d1) - np.asarray(d0)) / (
                    np.linalg.norm(np.asarray(d0))
                )
                assert rel < 1e-8, (lam, dd, rel)
                assert abs(float(a1) - float(a0)) < 1e-6 * abs(float(a0))

    def test_windowed_multi_panel_f64(self):
        """Bounded-span graph across multiple panels (panel < N): the
        measured band width is honored and the solve matches dense."""
        with jax.enable_x64():
            rng = np.random.default_rng(11)
            n, m, K, span = 25, 12, 4, 5
            lin, stereo = _windowed_linearization(rng, n, m, K, span)
            bw = measure_band_width(stereo)
            assert bw <= span
            # panel 12: NON-power-of-two (the auto panel snaps to multiples
            # of 32 above 64 — solve_schur_banded — so the shear-reshape
            # panelization must be exact for arbitrary panel sizes, incl.
            # a ragged last panel: 25 = 2*12 + 1).
            for panel in (8, 12, 16):
                d0 = solve_schur(
                    lin, stereo, n, m, 1e-2, diag_damping=True, jitter=1e-12
                )
                d1 = solve_schur_banded(
                    lin, stereo, n, m, 1e-2, band_w=bw, panel=panel,
                    diag_damping=True, jitter=1e-12, refine_iters=3,
                )
                rel = np.linalg.norm(np.asarray(d1) - np.asarray(d0)) / (
                    np.linalg.norm(np.asarray(d0))
                )
                assert rel < 1e-8, (panel, rel)
            # Windowed correction placement (measured chunk frame span,
            # small chunks so several windows are exercised) must be
            # EXACTLY the same math as full-width placement.
            from uslam_tpu.solvers.banded import measure_corr_window

            cw = measure_corr_window(stereo, lm_chunk=4)
            assert cw < n
            d2 = solve_schur_banded(
                lin, stereo, n, m, 1e-2, band_w=bw, panel=8,
                diag_damping=True, jitter=1e-12, refine_iters=3,
                corr_window=cw, corr_lm_chunk=4,
            )
            d1 = solve_schur_banded(
                lin, stereo, n, m, 1e-2, band_w=bw, panel=8,
                diag_damping=True, jitter=1e-12, refine_iters=3,
            )
            np.testing.assert_allclose(
                np.asarray(d2), np.asarray(d1), rtol=1e-9, atol=1e-12
            )

    def test_windowed_narrow_chunk_window_f64(self):
        """Regression: windowed placement with F < 2*band_w (chunk obs
        window barely wider than the longest track). The diagonal-
        extraction shear once read flat[f*(F+1)+d], which for f+d >= F
        wraps into row f+1's elements — structurally ZERO only when
        F >= 2*band_w, so fixture graphs with short tracks passed while
        long-track graphs (band_w ~ n) got a corrupted, indefinite band
        (NaN Cholesky). The column-padded shear reads the zero pad
        instead."""
        with jax.enable_x64():
            rng = np.random.default_rng(23)
            n, m, K, span = 15, 8, 6, 13      # band_w ~ 13, cw ~ 14 < 2*bw
            lin, stereo = _windowed_linearization(rng, n, m, K, span)
            bw = measure_band_width(stereo)
            from uslam_tpu.solvers.banded import measure_corr_window

            cw = measure_corr_window(stereo, lm_chunk=4)
            assert cw < 2 * bw, (cw, bw)      # the regression regime
            d0 = solve_schur(
                lin, stereo, n, m, 1e-2, diag_damping=True, jitter=1e-12
            )
            d1 = solve_schur_banded(
                lin, stereo, n, m, 1e-2, band_w=bw,
                diag_damping=True, jitter=1e-12, refine_iters=3,
                corr_window=cw, corr_lm_chunk=4,
            )
            rel = np.linalg.norm(np.asarray(d1) - np.asarray(d0)) / (
                np.linalg.norm(np.asarray(d0))
            )
            assert np.isfinite(np.asarray(d1)).all()
            assert rel < 1e-8, rel

    def test_band_width_measurement(self):
        rng = np.random.default_rng(3)
        lin, stereo = _windowed_linearization(rng, 30, 8, 4, 6)
        assert 1 <= measure_band_width(stereo) <= 6

    def test_corr_window_locality_with_masked_slots(self):
        """Regression: landmarks with MASKED obs slots must still measure a
        trajectory-local corr window. An int64 sentinel wrapped to -1 inside
        np.where(int32 cam_g) once poisoned lo to -1 for any landmark with a
        masked slot, silently disabling windowed placement (cw ~ n)."""
        import jax.numpy as jnp

        from uslam_tpu.solvers.banded import measure_corr_window

        rng = np.random.default_rng(5)
        n, m, K, span = 200, 40, 4, 5
        lin, stereo = _windowed_linearization(rng, n, m, K, span)
        # Mask one slot per landmark and order landmarks by first frame
        # (first-appearance interning), as pack_sequence produces.
        mask = np.asarray(stereo.lm_obs_mask).copy()
        mask[:, -1] = 0.0
        cam = np.asarray(stereo.cam_idx)
        cam_g = cam[np.asarray(stereo.lm_obs_idx)]
        lo = np.where(mask > 0, cam_g, n).min(axis=1)
        order = np.argsort(lo, kind="stable")
        stereo = stereo._replace(
            lm_obs_idx=jnp.asarray(np.asarray(stereo.lm_obs_idx)[order]),
            lm_obs_mask=jnp.asarray(mask[order]),
        )
        cw = measure_corr_window(stereo, lm_chunk=8)
        assert cw < n // 2, cw  # local, not the whole trajectory

    def test_f32_sanity(self):
        """f32 path: finite, and close to the f64 answer at solver-noise
        tolerance (scaling + jitter + refinement do their job)."""
        rng = np.random.default_rng(5)
        n, m, K, span = 25, 12, 4, 5
        lin, stereo = _windowed_linearization(rng, n, m, K, span)
        bw = measure_band_width(stereo)
        d32 = np.asarray(
            solve_schur_banded(
                lin, stereo, n, m, 1e-2, band_w=bw, diag_damping=True,
                refine_iters=4,
            )
        )
        assert np.isfinite(d32).all()
        with jax.enable_x64():
            lin64 = jax.tree.map(lambda x: jax.numpy.asarray(x, jax.numpy.float64)
                                 if jax.numpy.issubdtype(x.dtype, jax.numpy.floating) else x, lin)
            st64 = jax.tree.map(lambda x: jax.numpy.asarray(x, jax.numpy.float64)
                                if jax.numpy.issubdtype(x.dtype, jax.numpy.floating) else x, stereo)
            d64 = np.asarray(
                solve_schur_banded(
                    lin64, st64, n, m, 1e-2, band_w=bw, diag_damping=True,
                    jitter=1e-12, refine_iters=3,
                )
            )
        denom = np.linalg.norm(d64)
        assert np.linalg.norm(d32 - d64) / denom < 5e-3


class TestSurveyTrajectory:
    """Survey (transect) synthetic mode: analytic consistency + bounded
    track span + end-to-end LM with the banded reduced solver."""

    def test_analytic_consistency(self):
        from uslam_tpu.io.synthetic import SyntheticSpec, _pose_at

        spec = SyntheticSpec(trajectory="survey", duration=30.0)
        t = np.linspace(0.0, 30.0, 3001)
        st = _pose_at(spec, t)
        dt = t[1] - t[0]
        # vel == d pos/dt, acc == d vel/dt (central differences).
        v_fd = np.gradient(st["pos"], dt, axis=0)
        a_fd = np.gradient(st["vel"], dt, axis=0)
        assert np.abs(st["vel"][2:-2] - v_fd[2:-2]).max() < 2e-3
        assert np.abs(st["acc"][2:-2] - a_fd[2:-2]).max() < 2e-3
        # Rotation is orthonormal and omega_body consistent with R-dot.
        RtR = np.einsum("tij,tik->tjk", st["R"], st["R"])
        assert np.abs(RtR - np.eye(3)).max() < 1e-12

    def test_bounded_span_and_banded_lm(self):
        import jax.numpy as jnp

        from uslam_tpu.config import UslamConfig
        from uslam_tpu.eval.metrics import ate_rmse
        from uslam_tpu.geometry.camera import StereoCamera
        from uslam_tpu.graph.packing import pack_sequence
        from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
        from uslam_tpu.solvers.lm import optimize_lm
        import dataclasses

        spec = SyntheticSpec(
            trajectory="survey", duration=30.0, num_landmarks=96,
            odom_drift_rate=0.03, feature_noise_px=0.3, seed=4,
        )
        seq = generate_synthetic_sequence(spec)
        cfg = UslamConfig()
        graph, initial, _o, _ = pack_sequence(seq, cfg)
        bw = measure_band_width(graph.stereo)
        n = initial.num_poses
        assert bw < n // 2, (bw, n)  # genuinely banded, not full-span

        scfg = dataclasses.replace(
            cfg.solver, reduced_solver="banded", band_width=bw
        )
        cam = StereoCamera.from_config(cfg.camera)
        with jax.default_matmul_precision("highest"):
            vals, stats = jax.jit(
                lambda g, v: optimize_lm(
                    g, v, cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                    cfg.imu.gravity, scfg,
                )
            )(graph, initial)
        assert bool(stats.converged)
        assert float(stats.final_error) < 0.01 * float(stats.initial_error)
        gt = seq.gt_pos[:n]
        ate_i = ate_rmse(np.asarray(initial.pose_trans)[:n], gt)
        ate_f = ate_rmse(np.asarray(vals.pose_trans)[:n], gt)
        # A survey has no loop closures, so drift correction comes only
        # from DVL/IMU/pressure — expect improvement, not the 3-5x an
        # orbit's re-observations buy (solver equivalence itself is pinned
        # to the dense path by the f64 tests above).
        assert ate_f < ate_i, (ate_i, ate_f)
