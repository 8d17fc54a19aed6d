"""Blocked Schur complement over landmarks.

The production linear solver (SURVEY.md §7 step 3): eliminate every landmark
(3x3 blocks, batched inversion on the VPU/MXU), reduce onto the camera
system (9 dof per frame + 6 bias), solve the reduced system with a dense
Cholesky (or matrix-free CG), then back-substitute landmarks. Replaces the
sparse factorization GTSAM/SuiteSparse performs inside
``LevenbergMarquardtOptimizer.optimize`` (reference batch.py:337).

All landmark work is vmapped over the per-landmark observation groups built
by the GraphBuilder (``lm_obs_idx``/``lm_obs_mask``), padded to a static K —
masked observations contribute exactly zero.

Multi-chip note (SURVEY.md §2.2): every per-landmark/per-observation einsum
here shards cleanly over a "devices" mesh axis with one ``psum`` to combine
the reduced camera Hessian; see ``uslam_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uslam_tpu.graph.builder import StereoObservations
from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, LM_DIM, POSE_DIM
from uslam_tpu.solvers.dense import assemble_dense, scaled_cho_solve, scatter_H, scatter_g
from uslam_tpu.solvers.linearize import Linearization


def solve_schur(
    lin: Linearization,
    stereo: StereoObservations,
    num_poses: int,
    num_landmarks: int,
    damping,
    cg: bool = False,
    cg_iters: int = 200,
    cg_tol: float = 1e-8,
):
    """Solve the damped normal equations; returns delta over the full
    tangent layout [frames(9N), bias(6), landmarks(3M)]."""
    n, m = num_poses, num_landmarks
    Dc = FRAME_DIM * n + BIAS_DIM
    dtype = lin.stereo_r.dtype
    lam = jnp.asarray(damping, dtype)

    # Camera-only part from priors + IMU + DVL.
    H_cc, g_c, _ = assemble_dense(lin, n, 0)

    Jp, Jl, r = lin.stereo_J_pose, lin.stereo_J_lm, lin.stereo_r
    p_off = FRAME_DIM * stereo.cam_idx

    # Stereo pose-pose diagonal + gradient.
    H_cc = scatter_H(H_cc, p_off, p_off, jnp.einsum("fda,fdb->fab", Jp, Jp))
    g_c = scatter_g(g_c, p_off, -jnp.einsum("fda,fd->fa", Jp, r))

    # Landmark system.
    Hll = jnp.zeros((m, LM_DIM, LM_DIM), dtype)
    Hll = Hll.at[stereo.lm_idx].add(jnp.einsum("fda,fdb->fab", Jl, Jl))
    g_l = jnp.zeros((m, LM_DIM), dtype)
    g_l = g_l.at[stereo.lm_idx].add(-jnp.einsum("fda,fd->fa", Jl, r))

    # Damped 3x3 inverses (batched). Floor keeps padded landmarks sane.
    eye3 = jnp.eye(LM_DIM, dtype=dtype)
    Hll_damped = Hll + (lam + 1e-8) * eye3
    Hll_inv = jnp.linalg.inv(Hll_damped)

    # Camera-landmark coupling per observation: W_f = Jp_f^T Jl_f (6x3).
    W = jnp.einsum("fda,fdb->fab", Jp, Jl)

    # Gather per-landmark observation groups.
    Wg = W[stereo.lm_obs_idx] * stereo.lm_obs_mask[..., None, None]  # (M,K,6,3)
    cam_g = stereo.cam_idx[stereo.lm_obs_idx]                        # (M,K)

    # Schur correction of the gradient: g_red = g_c - W Hll^-1 g_l.
    y = jnp.einsum("mab,mb->ma", Hll_inv, g_l)                       # (M,3)
    g_corr = jnp.einsum("mkab,mb->mka", Wg, y)                       # (M,K,6)
    g_c = scatter_g(
        g_c,
        (FRAME_DIM * cam_g).reshape(-1),
        -g_corr.reshape(-1, POSE_DIM),
    )

    # Schur correction of the Hessian:
    # H_red -= sum_j W_{jk} Hll_j^{-1} W_{jl}^T for all obs pairs (k, l).
    Y = jnp.einsum("mkab,mbc->mkac", Wg, Hll_inv)                    # (M,K,6,3)
    corr = jnp.einsum("mkac,mlbc->mklab", Y, Wg)                     # (M,K,K,6,6)
    K = Wg.shape[1]
    rows = (FRAME_DIM * cam_g)[:, :, None].repeat(K, axis=2).reshape(-1)
    cols = (FRAME_DIM * cam_g)[:, None, :].repeat(K, axis=1).reshape(-1)
    H_red = scatter_H(H_cc, rows, cols, -corr.reshape(-1, POSE_DIM, POSE_DIM))

    # Damped reduced solve.
    H_red = H_red + (lam + 1e-8) * jnp.eye(Dc, dtype=dtype)
    if cg:
        delta_c = _cg_solve(H_red, g_c, cg_iters, cg_tol)
    else:
        delta_c = scaled_cho_solve(H_red, g_c)

    # Back-substitute landmarks: dl_j = Hll_j^-1 (g_l_j - sum_k W_{jk}^T dc_k).
    frames = delta_c[: FRAME_DIM * n].reshape(n, FRAME_DIM)
    dpose = frames[:, :POSE_DIM]                                     # (N,6)
    dpose_g = dpose[cam_g]                                           # (M,K,6)
    rhs = g_l - jnp.einsum("mkab,mka->mb", Wg, dpose_g)
    delta_l = jnp.einsum("mab,mb->ma", Hll_inv, rhs)

    return jnp.concatenate([delta_c, delta_l.reshape(-1)])


def _cg_solve(A, b, iters: int, tol: float):
    """CG on the symmetrically Jacobi-scaled system.

    The raw normal equations here are brutally ill-conditioned in f32 (IMU
    whitening spans ~1e4 in scale), so we solve
    (D^-1/2 A D^-1/2) y = D^-1/2 b with D = diag(A), then x = D^-1/2 y —
    mathematically Jacobi-PCG but with far better f32 rounding behavior.
    Kept for very large reduced systems where Cholesky's O(Dc^3) dominates;
    the matvec is a single MXU matmul.
    """
    d = jnp.sqrt(jnp.maximum(jnp.diag(A), 1e-20))
    d_inv = 1.0 / d
    As = A * d_inv[:, None] * d_inv[None, :]
    bs = b * d_inv
    b_norm_sq = jnp.maximum(bs @ bs, 1e-30)

    def body(state):
        x, r, p, rr, it = state
        Ap = As @ p
        pAp = p @ Ap
        alpha = jnp.where(pAp > 1e-30, rr / jnp.maximum(pAp, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = r @ r
        beta = jnp.where(rr > 1e-30, rr_new / jnp.maximum(rr, 1e-30), 0.0)
        p = r + beta * p
        return x, r, p, rr_new, it + 1

    def cond(state):
        _, _, _, rr, it = state
        return jnp.logical_and(it < iters, rr > tol * tol * b_norm_sq)

    state = (jnp.zeros_like(bs), bs, bs, bs @ bs, 0)
    y, *_ = jax.lax.while_loop(cond, body, state)
    return y * d_inv
