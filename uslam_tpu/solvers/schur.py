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
    """Solve the damped normal equations; returns delta over the global
    tangent layout [frames(9N), bias(6), landmarks(3M)].

    Internally the camera system uses a POSE-MAJOR layout
    [poses(6N) | vels(3N) | bias(6)] so the landmark Schur correction is a
    contiguous top-left block computed as ONE matmul, U @ V^T with
    U = stacked W Hll^{-1} and V = stacked W scattered into (6N, 3M) —
    the naive per-observation-pair scatter of M*K^2 6x6 blocks was ~50x
    slower on TPU (scatter-bound, measured ~1s/iteration at N=1000)."""
    n, m = num_poses, num_landmarks
    Dc = FRAME_DIM * n + BIAS_DIM
    pose_dim_total = POSE_DIM * n
    dtype = lin.stereo_r.dtype
    lam = jnp.asarray(damping, dtype)

    # Camera-only part from priors + IMU + DVL (pose-major layout).
    H_cc, g_c, _ = assemble_dense(lin, n, 0, pose_major=True)

    Jp, Jl, r = lin.stereo_J_pose, lin.stereo_J_lm, lin.stereo_r
    p_off = POSE_DIM * stereo.cam_idx

    # Stereo pose-pose diagonal + gradient (small scatter: F blocks).
    H_cc = scatter_H(H_cc, p_off, p_off, jnp.einsum("fda,fdb->fab", Jp, Jp))
    g_c = scatter_g(g_c, p_off, -jnp.einsum("fda,fd->fa", Jp, r))

    # Landmark system.
    Hll = jnp.zeros((m, LM_DIM, LM_DIM), dtype)
    Hll = Hll.at[stereo.lm_idx].add(jnp.einsum("fda,fdb->fab", Jl, Jl))
    g_l = jnp.zeros((m, LM_DIM), dtype)
    g_l = g_l.at[stereo.lm_idx].add(-jnp.einsum("fda,fd->fa", Jl, r))

    # Damped 3x3 inverses (batched). Floor keeps padded landmarks sane.
    eye3 = jnp.eye(LM_DIM, dtype=dtype)
    Hll_inv = jnp.linalg.inv(Hll + (lam + 1e-8) * eye3)

    # Per-observation coupling W_f = Jp_f^T Jl_f (6x3), grouped by landmark.
    W = jnp.einsum("fda,fdb->fab", Jp, Jl)
    Wg = W[stereo.lm_obs_idx] * stereo.lm_obs_mask[..., None, None]  # (M,K,6,3)
    cam_g = stereo.cam_idx[stereo.lm_obs_idx]                        # (M,K)
    Y = jnp.einsum("mkab,mbc->mkac", Wg, Hll_inv)                    # (M,K,6,3)

    # Stack into (N,6,M,3): T[cam_g[m,k], :, m, :] += blocks[m,k].
    # Unique (frame, landmark) slots -> a small, duplicate-light scatter of
    # M*K 6x3 blocks; the heavy lifting is then the single MXU matmul.
    def stack_blocks(blocks):
        T = jnp.zeros((n, POSE_DIM, m, LM_DIM), dtype)
        m_idx = jnp.broadcast_to(jnp.arange(m)[:, None], cam_g.shape)
        T = T.at[cam_g, :, m_idx, :].add(blocks)
        return T.reshape(pose_dim_total, m * LM_DIM)

    U = stack_blocks(Y)   # (6N, 3M) = stacked W Hll^-1
    V = stack_blocks(Wg)  # (6N, 3M) = stacked W

    # Gradient correction: g_red_pose -= U @ g_l  (y_m = Hll^-1 g_l folded
    # into U already? no — U = W Hll^-1, so U @ g_l_flat = sum_m W Hll^-1 g_l).
    g_c = g_c.at[:pose_dim_total].add(-(U @ g_l.reshape(-1)))

    # Hessian correction: one matmul on the contiguous pose block.
    H_corr = U @ V.T                                                 # (6N, 6N)
    H_red = H_cc.at[:pose_dim_total, :pose_dim_total].add(-H_corr)

    # Damped reduced solve.
    H_red = H_red + (lam + 1e-8) * jnp.eye(Dc, dtype=dtype)
    if cg:
        delta_perm = _cg_solve(H_red, g_c, cg_iters, cg_tol)
    else:
        delta_perm = scaled_cho_solve(H_red, g_c)

    # Back-substitute landmarks: dl = Hll^-1 (g_l - V^T dpose).
    dpose = delta_perm[:pose_dim_total]
    rhs = g_l - (V.T @ dpose).reshape(m, LM_DIM)
    delta_l = jnp.einsum("mab,mb->ma", Hll_inv, rhs)

    # Permute camera delta back to the global interleaved frame layout.
    dvel = delta_perm[pose_dim_total : pose_dim_total + 3 * n].reshape(n, 3)
    frames = jnp.concatenate([dpose.reshape(n, POSE_DIM), dvel], axis=1)
    delta_c = jnp.concatenate(
        [frames.reshape(-1), delta_perm[pose_dim_total + 3 * n :]]
    )
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
