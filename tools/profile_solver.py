"""Profile the LM iteration cost breakdown on the current backend.

Times, at bench scale (N poses, M landmarks):
  - pack_sequence ingest
  - linearize_graph
  - solve_schur (full linear solve)
  - the Schur assembly up to (H_red, g_c) (no factorization)
  - cholesky(H_red) alone
  - one forward+backward triangular solve pair
  - scaled_cho_solve (chol + 1+3 refinement tri-solve pairs)

Usage: python tools/profile_solver.py [--poses 1000] [--landmarks 512]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warm=1, name=""):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {name:38s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=1000)
    ap.add_argument("--landmarks", type=int, default=512)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    from uslam_tpu.config import SolverConfig, UslamConfig
    from uslam_tpu.geometry.camera import StereoCamera
    from uslam_tpu.graph.packing import pack_sequence
    from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, POSE_DIM
    from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
    from uslam_tpu.solvers import schur as schur_mod
    from uslam_tpu.solvers.dense import assemble_dense, scaled_cho_solve, scatter_H, scatter_g
    from uslam_tpu.solvers.linearize import linearize_graph
    from uslam_tpu.solvers.schur import solve_schur

    spec = SyntheticSpec(
        duration=args.poses / 5.0,
        keyframe_rate=5.0,
        num_landmarks=args.landmarks,
        omega=0.15,
        odom_drift_rate=0.02,
        feature_noise_px=0.3,
        seed=0,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig(solver=SolverConfig())
    t0 = time.perf_counter()
    graph, initial, _odom, _ = pack_sequence(seq, cfg)
    print(f"ingest: {time.perf_counter()-t0:.2f}s")
    cam = StereoCamera.from_config(cfg.camera)
    n, m = initial.num_poses, initial.num_landmarks
    F = graph.stereo.meas.shape[0]
    K = graph.stereo.lm_obs_idx.shape[1]
    print(f"N={n} M={m} F={F} K={K} Dc={FRAME_DIM*n+BIAS_DIM}")

    with jax.default_matmul_precision("highest"):
        lin_fn = jax.jit(
            lambda v: linearize_graph(
                graph, v, cam=cam, dvl_sigma=cfg.noise.dvl_sigma,
                stereo_sigma=cfg.noise.stereo_sigma, gravity=cfg.imu.gravity,
            )
        )
        lin = jax.block_until_ready(lin_fn(initial))
        timeit(lin_fn, initial, name="linearize_graph")

        solve_fn = jax.jit(
            lambda l: solve_schur(l, graph.stereo, n, m, jnp.float32(1e-5))
        )
        timeit(solve_fn, lin, name="solve_schur (full)")

        # --- new scatter-free internals ---
        from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense
        from uslam_tpu.solvers.schur import landmark_elimination
        from uslam_tpu.solvers.linearize import graph_error
        from uslam_tpu.graph.values import values_retract

        elim_fn = jax.jit(lambda l: landmark_elimination(l, graph.stereo, n, 1e-5))
        Hll_inv, g_l, U, V = jax.block_until_ready(elim_fn(lin))
        timeit(elim_fn, lin, name="landmark_elimination (gather+onehot)")

        bands_fn = jax.jit(lambda l: assemble_cam_bands(l, graph.stereo, n, 1e-5))
        bands = jax.block_until_ready(bands_fn(lin))
        timeit(bands_fn, lin, name="assemble_cam_bands")

        corr_fn = jax.jit(lambda U, V: U @ V.T)
        Hc = jax.block_until_ready(corr_fn(U, V))
        timeit(corr_fn, U, V, name="H_corr = U @ V.T")

        exp_fn = jax.jit(lambda b, Hc: expand_cam_dense(b, pp_extra=-Hc))
        timeit(exp_fn, bands, Hc, name="expand_cam_dense (+concat)")

        err_fn = jax.jit(
            lambda v: graph_error(
                graph, v, cam=cam, dvl_sigma=cfg.noise.dvl_sigma,
                stereo_sigma=cfg.noise.stereo_sigma, gravity=cfg.imu.gravity,
            )
        )
        timeit(err_fn, initial, name="graph_error (per-iter eval)")

        delta = jnp.zeros(9 * n + 6 + 3 * m, jnp.float32)
        ret_fn = jax.jit(values_retract)
        timeit(ret_fn, initial, delta, name="values_retract")

        # --- assembly-only: replicate schur.py up to H_red/g_c ---
        stereo = graph.stereo
        LM_DIM = 3

        def assemble_only(lin, damping):
            Dc = FRAME_DIM * n + BIAS_DIM
            pose_dim_total = POSE_DIM * n
            dtype = lin.stereo_r.dtype
            lam = jnp.asarray(damping, dtype)
            H_cc, g_c, _ = assemble_dense(lin, n, 0, pose_major=True)
            Jp, Jl, r = lin.stereo_J_pose, lin.stereo_J_lm, lin.stereo_r
            p_off = POSE_DIM * stereo.cam_idx
            H_cc = scatter_H(H_cc, p_off, p_off, jnp.einsum("fda,fdb->fab", Jp, Jp))
            g_c = scatter_g(g_c, p_off, -jnp.einsum("fda,fd->fa", Jp, r))
            Hll = jnp.zeros((m, LM_DIM, LM_DIM), dtype)
            Hll = Hll.at[stereo.lm_idx].add(jnp.einsum("fda,fdb->fab", Jl, Jl))
            g_l = jnp.zeros((m, LM_DIM), dtype)
            g_l = g_l.at[stereo.lm_idx].add(-jnp.einsum("fda,fd->fa", Jl, r))
            eye3 = jnp.eye(LM_DIM, dtype=dtype)
            Hll_inv = jnp.linalg.inv(Hll + (lam + 1e-8) * eye3)
            W = jnp.einsum("fda,fdb->fab", Jp, Jl)
            Wg = W[stereo.lm_obs_idx] * stereo.lm_obs_mask[..., None, None]
            cam_g = stereo.cam_idx[stereo.lm_obs_idx]
            Y = jnp.einsum("mkab,mbc->mkac", Wg, Hll_inv)

            def stack_blocks(blocks):
                T = jnp.zeros((n, POSE_DIM, m, LM_DIM), dtype)
                m_idx = jnp.broadcast_to(jnp.arange(m)[:, None], cam_g.shape)
                T = T.at[cam_g, :, m_idx, :].add(blocks)
                return T.reshape(pose_dim_total, m * LM_DIM)

            U = stack_blocks(Y)
            V = stack_blocks(Wg)
            g_c = g_c.at[:pose_dim_total].add(-(U @ g_l.reshape(-1)))
            H_corr = U @ V.T
            H_red = H_cc.at[:pose_dim_total, :pose_dim_total].add(-H_corr)
            H_red = H_red + (lam + 1e-8) * jnp.eye(Dc, dtype=dtype)
            return H_red, g_c

        asm_fn = jax.jit(lambda l: assemble_only(l, 1e-5))
        H_red, g_c = jax.block_until_ready(asm_fn(lin))
        timeit(asm_fn, lin, name="schur assembly -> (H_red, g_c)")

        # --- sub-pieces of the assembly ---
        ad_fn = jax.jit(lambda l: assemble_dense(l, n, 0, pose_major=True)[0])
        timeit(ad_fn, lin, name="assemble_dense (cam-only scatters)")

        def through_UV(lin, damping):
            dtype = lin.stereo_r.dtype
            lam = jnp.asarray(damping, dtype)
            Jp, Jl, r = lin.stereo_J_pose, lin.stereo_J_lm, lin.stereo_r
            Hll = jnp.zeros((m, LM_DIM, LM_DIM), dtype)
            Hll = Hll.at[stereo.lm_idx].add(jnp.einsum("fda,fdb->fab", Jl, Jl))
            eye3 = jnp.eye(LM_DIM, dtype=dtype)
            Hll_inv = jnp.linalg.inv(Hll + (lam + 1e-8) * eye3)
            W = jnp.einsum("fda,fdb->fab", Jp, Jl)
            Wg = W[stereo.lm_obs_idx] * stereo.lm_obs_mask[..., None, None]
            cam_g = stereo.cam_idx[stereo.lm_obs_idx]
            Y = jnp.einsum("mkab,mbc->mkac", Wg, Hll_inv)

            def stack_blocks(blocks):
                T = jnp.zeros((n, POSE_DIM, m, LM_DIM), dtype)
                m_idx = jnp.broadcast_to(jnp.arange(m)[:, None], cam_g.shape)
                T = T.at[cam_g, :, m_idx, :].add(blocks)
                return T.reshape(POSE_DIM * n, m * LM_DIM)

            return stack_blocks(Y), stack_blocks(Wg)

        uv_fn = jax.jit(lambda l: through_UV(l, 1e-5))
        U, V = jax.block_until_ready(uv_fn(lin))
        timeit(uv_fn, lin, name="landmark elim -> (U, V) stacks")

        mm_fn = jax.jit(lambda U, V: U @ V.T)
        timeit(mm_fn, U, V, name="U @ V.T (6N x 3M matmul, highest)")

        eye_fn = jax.jit(lambda H: H + 1e-5 * jnp.eye(H.shape[0], dtype=H.dtype))
        timeit(eye_fn, H_red, name="H + lam*eye(Dc) (materialized eye)")

        diag_fn = jax.jit(
            lambda H: H.at[jnp.arange(H.shape[0]), jnp.arange(H.shape[0])].add(1e-5)
        )
        timeit(diag_fn, H_red, name="H.at[diag].add (scatter form)")

        Dc = H_red.shape[0]
        chol_fn = jax.jit(jnp.linalg.cholesky)
        # use a well-conditioned SPD proxy with same size
        d = jnp.sqrt(jnp.maximum(jnp.diag(H_red), 1e-20))
        Hs = H_red * (1.0 / d)[:, None] * (1.0 / d)[None, :] + 1e-6 * jnp.eye(Dc)
        L = jax.block_until_ready(chol_fn(Hs))
        timeit(chol_fn, Hs, name=f"cholesky({Dc})")

        import jax.scipy.linalg as jsl

        tri_fn = jax.jit(
            lambda L, b: jsl.solve_triangular(
                L.T, jsl.solve_triangular(L, b, lower=True), lower=False
            )
        )
        b = g_c / d
        timeit(tri_fn, L, b, name="tri_solve pair (fwd+bwd)")

        scs_fn = jax.jit(scaled_cho_solve)
        timeit(scs_fn, H_red, g_c, name="scaled_cho_solve (chol + 4 pairs)")


if __name__ == "__main__":
    main()
