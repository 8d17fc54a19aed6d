"""Per-stage cost breakdown of the BANDED reduced solve at survey scale.

The 4k-pose per-iteration cost scales super-linearly (63 ms/iter at 1k
dense -> 132 at 2k -> 258 at 4k banded, BENCH_r02); this prints where it
goes, mirroring what CLAUDE.md documents for the 1k dense budget:

  - landmark elimination parts (Hll_inv, W, Y)
  - band correction (the landmark-chunked one-hot placement — the
    suspected hot spot, solvers/banded.py::_band_correction)
  - camera band assembly + frame-band merge
  - panelization (shear-reshape)
  - block-tridiagonal Thomas factorization
  - one banded solve application (fwd+bwd scans)
  - full solve_schur_banded
  - linearize_graph
  - one full LM iteration (solve + retract + error)

Usage: python tools/profile_banded.py [--poses 4000] [--landmarks 4000]
       [--lm-chunk 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3, warm=1, name=""):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:44s} {best * 1e3:9.2f} ms")
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=4000)
    ap.add_argument("--landmarks", type=int, default=0, help="0 = poses")
    ap.add_argument("--lm-chunk", type=int, default=128)
    ap.add_argument("--panel", type=int, default=0, help="0 = auto pow2")
    ap.add_argument("--refine", type=int, default=-1, help="-1 = config default")
    ap.add_argument("--unroll", type=int, default=1, help="Thomas scan unroll")
    ap.add_argument("--stages", default="all",
                    help="all | solve (only factor/apply/solve/iter)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/uslam_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass

    print(f"backend={jax.default_backend()}")

    from uslam_tpu.config import UslamConfig
    from uslam_tpu.geometry.camera import StereoCamera
    from uslam_tpu.graph.packing import pack_sequence
    from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
    from uslam_tpu.solvers import banded as B
    from uslam_tpu.solvers.bands import assemble_cam_bands
    from uslam_tpu.solvers.linearize import graph_error, linearize_graph
    from uslam_tpu.graph.values import values_retract

    cfg = UslamConfig()
    n_lms = args.landmarks or args.poses
    # Matches bench.py's scaling sweep problem EXACTLY (omega included —
    # omega=0.15 turns raise the measured band width 41 -> 66 at 4k, which
    # flips the auto panel from 64 to 128).
    spec = SyntheticSpec(
        trajectory="survey",
        duration=args.poses / 5.0,
        keyframe_rate=5.0,
        num_landmarks=n_lms,
        omega=0.15,
        max_feature_depth=10.0,
        odom_drift_rate=0.02,
        feature_noise_px=0.3,
        seed=0,
    )
    seq = generate_synthetic_sequence(spec)
    graph, initial, _odom, _ = pack_sequence(seq, cfg)
    cam = StereoCamera.from_config(cfg.camera)
    n, m = initial.num_poses, initial.num_landmarks
    bw = B.measure_band_width(graph.stereo)
    cw = B.measure_corr_window(graph.stereo, args.lm_chunk)
    if args.panel:
        panel = args.panel
    else:
        panel = 16
        while panel < bw:
            panel *= 2
        if panel > 64:
            panel = -(-bw // 32) * 32  # mirrors solve_schur_banded's auto
    if args.refine >= 0:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, solver=_dc.replace(cfg.solver, refine_iters=args.refine))
    K = graph.stereo.lm_obs_idx.shape[1]
    print(
        f"n={n} m={m} K={K} band_w={bw} corr_window={cw} panel={panel} "
        f"lm_chunk={args.lm_chunk}"
    )

    kwargs = dict(
        cam=cam, dvl_sigma=cfg.noise.dvl_sigma,
        stereo_sigma=cfg.noise.stereo_sigma, gravity=cfg.imu.gravity,
    )
    with jax.default_matmul_precision("highest"):
        lin_fn = jax.jit(lambda v: linearize_graph(graph, v, **kwargs))
        lin = jax.block_until_ready(lin_fn(initial))
        lam = jnp.asarray(1e-5, jnp.float32)

        parts_fn = jax.jit(
            lambda l: B._landmark_parts(l, graph.stereo, lam, True)
        )
        Hll_inv, g_l, W, Y = jax.block_until_ready(parts_fn(lin))
        cam_g = jnp.asarray(graph.stereo.cam_idx)[graph.stereo.lm_obs_idx]

        corr_fn = jax.jit(
            lambda W, Y, g_l: B._band_correction(
                W, Y, g_l, cam_g, graph.stereo.lm_obs_mask, n, bw,
                lm_chunk=args.lm_chunk, corr_window=cw,
            )
        )
        B_corr, g_corr = jax.block_until_ready(corr_fn(W, Y, g_l))

        bands_fn = jax.jit(
            lambda l: assemble_cam_bands(l, graph.stereo, n, lam, True)
        )
        bands = jax.block_until_ready(bands_fn(lin))
        fb_fn = jax.jit(
            lambda bands, B_corr, g_corr: B._frame_band(
                bands, B_corr, g_corr, n, bw
            )
        )
        band, bias_col, bb, g, gb = jax.block_until_ready(
            fb_fn(bands, B_corr, g_corr)
        )
        pan_fn = jax.jit(lambda band: B._panelize(band, panel))
        D, O = jax.block_until_ready(pan_fn(band))
        fac_fn = jax.jit(lambda D, O: B.block_tridiag_factor(D, O, unroll=args.unroll))
        L = jax.block_until_ready(fac_fn(D, O))
        rhs = jnp.zeros((D.shape[0], D.shape[1], 7), jnp.float32) + 1.0
        app_fn = jax.jit(lambda L, O, r: B.block_tridiag_apply(L, O, r, unroll=args.unroll))
        facapp_fn = jax.jit(lambda D, O, r: B.block_tridiag_factor_apply(D, O, r, unroll=args.unroll))

        solve_fn = jax.jit(
            lambda l: B.solve_schur_banded(
                l, graph.stereo, n, m, lam, band_w=bw, panel=panel,
                refine_iters=cfg.solver.refine_iters,
                jitter=cfg.solver.cholesky_jitter, diag_damping=True,
                corr_window=cw, corr_lm_chunk=args.lm_chunk,
                unroll=args.unroll,
            )
        )
        err_fn = jax.jit(lambda v: graph_error(graph, values=v, **kwargs))

        def lm_iter(v):
            l = linearize_graph(graph, v, **kwargs)
            d = B.solve_schur_banded(
                l, graph.stereo, n, m, lam, band_w=bw, panel=panel,
                refine_iters=cfg.solver.refine_iters,
                jitter=cfg.solver.cholesky_jitter, diag_damping=True,
                corr_window=cw, corr_lm_chunk=args.lm_chunk,
                unroll=args.unroll,
            )
            c = values_retract(v, d)
            return c, graph_error(graph, values=c, **kwargs)

        lm_fn = jax.jit(lm_iter)

        print("stage timings (best of 3):")
        t_corr = 0.0
        if args.stages == "all":
            timeit(lin_fn, initial, name="linearize_graph")
            timeit(parts_fn, lin, name="landmark parts (Hll_inv, W, Y)")
            t_corr = timeit(corr_fn, W, Y, g_l, name="band correction (placement)")
            timeit(bands_fn, lin, name="camera band assembly")
            timeit(fb_fn, bands, B_corr, g_corr, name="frame-band merge")
            timeit(pan_fn, band, name="panelize (shear)")
        t_fac = timeit(fac_fn, D, O, name="Thomas factorization")
        timeit(app_fn, L, O, rhs, name="banded apply (7 rhs)")
        timeit(facapp_fn, D, O, rhs, name="fused factor+apply (7 rhs)")
        t_solve = timeit(solve_fn, lin, name="solve_schur_banded (full)")
        t_lm = timeit(lm_fn, initial, name="one full LM iteration")
        print(
            f"summary: correction {t_corr:.0f} + factor {t_fac:.0f} "
            f"of solve {t_solve:.0f}; full iter {t_lm:.0f} ms "
            f"(panel={panel} refine={cfg.solver.refine_iters} "
            f"unroll={args.unroll})"
        )


if __name__ == "__main__":
    main()
