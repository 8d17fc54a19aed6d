"""Landmark-sharded solve vs the single-device path (8-device CPU mesh from
conftest's xla_force_host_platform_device_count).

Two layers:
- one fixed-lambda production step (velocity elimination + Marquardt diag
  damping) through ``solve_schur(axis_name=...)``;
- the FULL production LM policy (``optimize_lm`` — accept/reject
  while_loop, plateau stop) via ``sharded_optimize_lm``, pinned to the
  single-chip solve at solver-noise tolerance (one graph size: the f64
  8-virtual-device while_loop interprets on this box's single core, so
  each extra size was ~7 min of pure execution per suite run; the
  per-iteration pin is size-independent algebra).
"""

import jax
import numpy as np
import pytest

from uslam_tpu.graph.values import values_retract
from uslam_tpu.parallel.mesh import (
    make_mesh,
    shard_landmarks,
    sharded_lm_step,
    sharded_optimize_lm,
)
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.solvers.lm import optimize_lm
from uslam_tpu.solvers.schur import solve_schur

from tests.test_solver import build_graph

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_mesh
def test_sharded_step_matches_single_device():
    slam, graph, initial, _ = build_graph(duration=3.0)
    cfg = slam.config
    assert initial.num_landmarks % 8 == 0  # builder buckets to powers of 2

    # Production-step settings on both sides (velocity elimination +
    # Marquardt diag damping). lam=1.0 keeps weak modes regularized so the
    # psum's different f32 reduction order stays at solver-noise level.
    with jax.default_matmul_precision("highest"):
        lin = linearize_graph(
            graph, initial, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
            cfg.imu.gravity,
        )
        delta = solve_schur(
            lin, graph.stereo, initial.num_poses, initial.num_landmarks, 1.0,
            diag_damping=True, eliminate_velocities=True,
        )
        ref = values_retract(initial, delta)

    mesh = make_mesh(8)
    g_sh, v_sh = shard_landmarks(graph, initial, mesh)
    with jax.default_matmul_precision("highest"):
        out = sharded_lm_step(
            g_sh, v_sh, slam.cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            1.0, mesh,
        )

    np.testing.assert_allclose(
        np.asarray(out.pose_trans), np.asarray(ref.pose_trans), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.landmarks), np.asarray(ref.landmarks), atol=5e-3
    )


@needs_mesh
def test_sharded_banded_solve_matches_single_device():
    """The BANDED reduced solver under landmark sharding (psum of the
    correction band + all_gather of the landmark delta) must reproduce
    the single-device banded solve exactly in f64 — incl. the windowed
    correction placement and the return_aux g.delta."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tests.test_banded import _windowed_linearization
    from uslam_tpu.parallel.mesh import shard_map
    from uslam_tpu.solvers.banded import (
        measure_band_width,
        measure_corr_window,
        solve_schur_banded,
    )

    with jax.enable_x64():
        rng = np.random.default_rng(7)
        n, m, K, span = 30, 16, 4, 5
        lin, stereo = _windowed_linearization(rng, n, m, K, span)
        lin = _to_f64(lin)
        stereo = _to_f64(stereo)
        bw = measure_band_width(stereo)
        cw = measure_corr_window(stereo, lm_chunk=2)
        kw = dict(
            band_w=bw, panel=8, diag_damping=True, jitter=1e-12,
            refine_iters=3, corr_window=cw, corr_lm_chunk=2,
            return_aux=True,
        )
        d0, a0 = solve_schur_banded(lin, stereo, n, m, 1e-2, **kw)

        mesh = make_mesh(8)
        skel = stereo._replace(
            lm_obs_idx=jnp.zeros((0,), stereo.lm_obs_idx.dtype),
            lm_obs_mask=jnp.zeros((0,), stereo.lm_obs_mask.dtype),
        )

        def run(lin, skel, lm_obs_idx, lm_obs_mask):
            st = skel._replace(
                lm_obs_idx=lm_obs_idx, lm_obs_mask=lm_obs_mask
            )
            return solve_schur_banded(
                lin, st, n, m, 1e-2, axis_name="devices", **kw
            )

        spec_rep = P()
        run_sharded = shard_map(
            run,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: spec_rep, lin),
                jax.tree.map(lambda _: spec_rep, skel),
                P("devices"),
                P("devices"),
            ),
            out_specs=(spec_rep, spec_rep),
            check_vma=False,
        )
        d1, a1 = run_sharded(
            lin, skel, stereo.lm_obs_idx, stereo.lm_obs_mask
        )

    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(float(a1), float(a0), rtol=1e-9)


@needs_mesh
def test_sharded_banded_production_lm_smoke():
    """The FULL production LM policy with the banded reduced solver,
    landmark-sharded: compiles, runs, converges to a finite solution.
    (Exact sharded-vs-single equivalence of the banded LINEAR solve is
    pinned in f64 above; this covers the lm.py plumbing end to end
    without paying a second while_loop compile.)"""
    import dataclasses

    from uslam_tpu.solvers.banded import measure_band_width, measure_corr_window

    slam, graph, initial, _ = build_graph(duration=3.0, drift=0.03,
                                          feature_noise=0.3, seed=5)
    cfg = slam.config
    assert initial.num_landmarks % 8 == 0
    bw = measure_band_width(graph.stereo)
    scfg = dataclasses.replace(
        cfg.solver, reduced_solver="banded", band_width=bw,
        banded_corr_window=measure_corr_window(graph.stereo),
        max_iterations=8, plateau_patience=3,
    )
    mesh = make_mesh(8)
    g_sh, v_sh = shard_landmarks(graph, initial, mesh)
    with jax.default_matmul_precision("highest"):
        vals, stats = sharded_optimize_lm(
            g_sh, v_sh, slam.cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            mesh, cfg=scfg,
        )
    assert np.isfinite(np.asarray(vals.pose_trans)).all()
    assert float(stats.final_error) < float(stats.initial_error) * 1e-4


def _to_f64(tree):
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else jnp.asarray(x),
        tree,
    )


@needs_mesh
@pytest.mark.parametrize("duration", [3.0])
def test_sharded_production_lm_matches_single_device(duration):
    """The FULL production policy (velocity elimination, Marquardt
    damping, accept/reject while_loop, plateau stop), sharded vs
    single-chip — in f64, where the algebra is sharp, so the pin tests the
    SHARDING decomposition (psum/all_gather), not f32 weak-mode luck.

    Pinned over a FIXED iteration budget (3 full policy iterations through
    the while_loop), not full convergence: per-iteration equivalence is the
    stronger invariant (convergence equivalence follows by induction), and
    two full f64 convergence runs on the 8-virtual-device 1-core mesh were
    ~20 min of every suite run. A short sharded full-solve smoke below
    keeps end-to-end convergence covered."""
    import dataclasses

    slam, graph, initial, _ = build_graph(
        duration=duration, drift=0.05, feature_noise=0.3, seed=2
    )
    cfg = slam.config
    solver_cfg = dataclasses.replace(cfg.solver, max_iterations=3)

    with jax.enable_x64():
        graph64, init64 = _to_f64(graph), _to_f64(initial)
        ref_vals, ref_stats = jax.jit(
            lambda g, v: optimize_lm(
                g, v, slam.cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                cfg.imu.gravity, solver_cfg,
            )
        )(graph64, init64)

        mesh = make_mesh(8)
        g_sh, v_sh = shard_landmarks(graph64, init64, mesh)
        out_vals, out_stats = sharded_optimize_lm(
            g_sh, v_sh, slam.cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            mesh, cfg=solver_cfg,
        )

    assert int(out_stats.iterations) == int(ref_stats.iterations)
    ref_err = float(ref_stats.final_error)
    out_err = float(out_stats.final_error)
    # psum reduction order differs from the single-device sum: ~1e-9
    # relative f64 noise after 3 iterations (measured 1.4e-9).
    np.testing.assert_allclose(out_err, ref_err, rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(out_vals.pose_trans), np.asarray(ref_vals.pose_trans),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out_vals.landmarks), np.asarray(ref_vals.landmarks),
        atol=1e-7,
    )


@needs_mesh
@pytest.mark.slow
def test_sharded_production_lm_full_solve_converges():
    """Short end-to-end smoke: the sharded production LM runs to
    CONVERGENCE in f64 and reaches the expected error decade (the
    per-iteration sharded==single pin above carries the equivalence
    guarantee; this covers the convergence/termination plumbing).

    duration 2.0 (vs the pin's 3.0): a smaller graph halves the f64
    while_loop's per-iteration interpretation cost on the 1-core
    8-virtual-device mesh — this test only exercises termination.

    Marked slow (USLAM_RUN_SLOW=1): the f64 full-convergence while_loop on
    the 8-virtual-device 1-core mesh is minutes of pure interpretation per
    run, and its assertions are covered every run by the 3-iteration f64
    equivalence pin above plus the f32 banded convergence smoke
    (test_sharded_banded_production_lm_smoke)."""
    slam, graph, initial, _ = build_graph(
        duration=2.0, drift=0.05, feature_noise=0.3, seed=2
    )
    cfg = slam.config

    with jax.enable_x64():
        graph64, init64 = _to_f64(graph), _to_f64(initial)
        mesh = make_mesh(8)
        g_sh, v_sh = shard_landmarks(graph64, init64, mesh)
        out_vals, out_stats = sharded_optimize_lm(
            g_sh, v_sh, slam.cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            mesh, cfg=cfg.solver,
        )

    assert bool(out_stats.converged)
    assert np.isfinite(np.asarray(out_vals.pose_trans)).all()
    assert float(out_stats.final_error) < float(out_stats.initial_error) * 1e-4


@needs_mesh
def test_frontend_frames_sharded_matches_batch():
    """Front-end DP over frames (SURVEY §2.2's second parallel axis): the
    mesh-sharded extraction + per-pair stereo matching must reproduce the
    single-device batched path on an 8-frame batch."""
    import jax.numpy as jnp

    from tests.test_frontend import textured_image
    from uslam_tpu.config import FrontendConfig
    from uslam_tpu.frontend.match import stereo_match
    from uslam_tpu.frontend.orb import extract_orb_batch
    from uslam_tpu.parallel.frames import (
        extract_orb_frames_sharded,
        process_stereo_pairs_sharded,
    )

    cfg = FrontendConfig(pyramid_levels=2)
    imgs = np.stack([textured_image(96, 128, seed=s) for s in range(8)])
    imgs_j = jnp.asarray(imgs)

    mesh = make_mesh(8)
    ref = extract_orb_batch(imgs_j, cfg)
    out = extract_orb_frames_sharded(imgs_j, mesh, cfg)

    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(
        np.asarray(out.xy)[m], np.asarray(ref.xy)[m], atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out.desc)[m], np.asarray(ref.desc)[m]
    )
    assert m.any()

    # Stereo pairs: right = left shifted (disparity 4 px).
    rights = np.roll(imgs, -4, axis=2)
    kl, kr, sidx, smask = process_stereo_pairs_sharded(
        imgs_j, jnp.asarray(rights), mesh, cfg
    )
    assert np.asarray(smask).any()
    # Reference: same compute, single device, one pair at a time.
    for b in range(8):
        kp = extract_orb_batch(jnp.stack([imgs_j[b], jnp.asarray(rights[b])]), cfg)
        kp_l = jax.tree.map(lambda a: a[0], kp)
        kp_r = jax.tree.map(lambda a: a[1], kp)
        sm = stereo_match(
            kp_l.desc, kp_l.xy, kp_l.mask, kp_r.desc, kp_r.xy, kp_r.mask,
            max_distance=cfg.match_max_distance, ratio=cfg.match_ratio,
            max_v_diff=cfg.stereo_max_v_diff,
            min_disparity=cfg.stereo_min_disparity, use_pallas=False,
        )
        np.testing.assert_array_equal(
            np.asarray(smask)[b], np.asarray(sm.mask)
        )
        mm = np.asarray(sm.mask)
        np.testing.assert_array_equal(
            np.asarray(sidx)[b][mm], np.asarray(sm.idx)[mm]
        )
