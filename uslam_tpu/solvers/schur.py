"""Blocked Schur complement over landmarks — scatter-free TPU formulation.

The production linear solver (SURVEY.md §7 step 3): eliminate every landmark
(3x3 blocks, batched inversion on the VPU/MXU), reduce onto the camera
system (9 dof per frame + 6 bias), solve the reduced system with a dense
Cholesky (or matrix-free CG), then back-substitute landmarks. Replaces the
sparse factorization GTSAM/SuiteSparse performs inside
``LevenbergMarquardtOptimizer.optimize`` (reference batch.py:337).

TPU formulation (profiled on v5e; scatters serialize per update there):
- landmark-grouped quantities come from **gathers** of the flat per-
  observation arrays (``lm_obs_idx``/``lm_obs_mask``, padded to static K —
  masked observations contribute exactly zero);
- the per-(landmark, obs) coupling blocks are stacked into the (6N, 3M)
  operands of the single Schur matmul with a **batched one-hot matmul**,
  not a scatter;
- the camera-only part is block-banded and assembled scatter-free in
  :mod:`uslam_tpu.solvers.bands`.

Multi-chip note (SURVEY.md §2.2): every per-landmark einsum here shards
cleanly over a "devices" mesh axis with one ``psum`` to combine the reduced
camera Hessian; see ``uslam_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.graph.builder import StereoObservations
from uslam_tpu.graph.values import BIAS_DIM, LM_DIM, POSE_DIM, VEL_DIM
from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense
from uslam_tpu.solvers.dense import inv3x3, scaled_cho_solve
from uslam_tpu.solvers.linearize import Linearization


def landmark_elimination(
    lin: Linearization, stereo: StereoObservations, n: int, damping,
    diag_damping: bool = False,
):
    """Gather-grouped landmark elimination.

    Returns (Hll_inv (M,3,3), g_l (M,3), U (6N,3M), V (6N,3M)) where
    U = stacked W Hll^{-1}, V = stacked W, W the pose-landmark coupling.
    """
    Jp, Jl, r = lin.stereo_J_pose, lin.stereo_J_lm, lin.stereo_r
    dtype = r.dtype
    lam = jnp.asarray(damping, dtype)
    m, K = stereo.lm_obs_idx.shape

    mask_b = stereo.lm_obs_mask[..., None, None]
    Jp_g = Jp[stereo.lm_obs_idx] * mask_b                 # (M,K,3,6)
    Jl_g = Jl[stereo.lm_obs_idx] * mask_b                 # (M,K,3,3)
    r_g = r[stereo.lm_obs_idx] * stereo.lm_obs_mask[..., None]

    Hll = jnp.einsum("mkda,mkdb->mab", Jl_g, Jl_g)
    g_l = -jnp.einsum("mkda,mkd->ma", Jl_g, r_g)
    # Damped 3x3 inverses (batched). Floor keeps padded landmarks sane.
    eye3 = jnp.eye(LM_DIM, dtype=dtype)
    if diag_damping:
        Hll_inv = inv3x3(Hll + (lam * Hll) * eye3 + 1e-8 * eye3)
    else:
        Hll_inv = inv3x3(Hll + (lam + 1e-8) * eye3)

    W = jnp.einsum("mkda,mkdb->mkab", Jp_g, Jl_g)         # (M,K,6,3)
    Y = jnp.einsum("mkab,mbc->mkac", W, Hll_inv)          # (M,K,6,3)

    # Stack into (6N, 3M) via a batched one-hot matmul (contraction over K
    # on the MXU) — the scatter formulation of this stacking was the single
    # most expensive op in the solve.
    cam_g = stereo.cam_idx[stereo.lm_obs_idx]             # (M,K)
    onehot = (cam_g[..., None] == jnp.arange(n)[None, None, :]).astype(dtype)
    YW = jnp.concatenate(
        [Y.reshape(m, K, 18), W.reshape(m, K, 18)], axis=-1
    )                                                     # (M,K,36)
    # HIGH (3-pass bf16 ~ f32-equivalent) instead of the solver-wide
    # HIGHEST (6-pass): this stacking is the widest matmul in the solve and
    # 3 extra passes buy nothing the refinement loop doesn't already cover.
    stacked = jnp.einsum(
        "mkn,mkx->mnx", onehot, YW, precision=jax.lax.Precision.HIGH
    )                                                     # (M,N,36)

    def to_flat(x):                                       # (M,N,18) -> (6N,3M)
        return (
            x.reshape(m, n, POSE_DIM, LM_DIM)
            .transpose(1, 2, 0, 3)
            .reshape(n * POSE_DIM, m * LM_DIM)
        )

    U = to_flat(stacked[..., :18])
    V = to_flat(stacked[..., 18:])
    return Hll_inv, g_l, U, V


def solve_schur(
    lin: Linearization,
    stereo: StereoObservations,
    num_poses: int,
    num_landmarks: int,
    damping,
    cg: bool = False,
    cg_iters: int = 200,
    cg_tol: float = 1e-8,
    return_aux: bool = False,
    refine_iters: int = 4,
    jitter: float = 1e-7,
    diag_damping: bool = False,
    eliminate_velocities: bool = False,
    axis_name: str | None = None,
):
    """Solve the damped normal equations; returns delta over the global
    tangent layout [frames(9N), bias(6), landmarks(3M)].

    Internally the camera system uses a POSE-MAJOR layout
    [poses(6N) | vels(3N) | bias(6)] so the landmark Schur correction is a
    contiguous top-left block computed as ONE matmul U @ V^T.

    ``eliminate_velocities`` additionally eliminates the velocity chain
    (block-tridiagonal: IMU intervals couple v_k to v_{k+1}, DVL observes
    each v_k) before the big factorization, shrinking the reduced Cholesky
    from 9N+6 to 6N+6 — a 3.4x FLOP cut at the bench's N=1000. The
    elimination deliberately IGNORES the tridiagonal structure (dense
    scaled chol(3N) + one wide triangular solve + one G^T G matmul, see
    :func:`_solve_vel_eliminated`; the scan-based Thomas/Spike variants in
    solvers.tridiag measured far slower on TPU). It is a direct,
    refinement-free solve, so step quality matches the full factorization;
    equivalence is locked by f64 tests.

    With ``return_aux`` also returns g.delta (gradient-step inner product,
    gradient of the 0.5||r||^2 objective) — the cheap ingredient for the LM
    gain ratio's predicted decrease 0.5 (g.delta + lambda ||delta||^2).

    ``axis_name``: when set, the call runs inside a ``shard_map`` whose
    landmark grouping (``stereo.lm_obs_idx``/``lm_obs_mask``) is sharded
    over that mesh axis. Landmark elimination and back-substitution are
    shard-local; the reduced-system corrections are combined with one
    ``psum`` (riding ICI) and the landmark delta with one ``all_gather`` —
    the production multi-chip path (SURVEY.md §2.2)."""
    n = num_poses
    pose_dim_total = POSE_DIM * n

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    Hll_inv, g_l, U, V = landmark_elimination(lin, stereo, n, damping, diag_damping)
    m_loc = g_l.shape[0]  # shard-local landmark count (== M single-chip)

    # Camera bands (scatter-free) + the Schur correction, fused at expansion.
    bands = assemble_cam_bands(lin, stereo, n, damping, diag_damping)
    H_corr = jax.lax.dot_general(                         # (6N, 6N), the MXU hot spot
        U, V, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGH
    )
    H_corr = _psum(H_corr)
    g_corr = _psum(U @ g_l.reshape(-1))                   # (6N,)

    def _gather_lm(delta_l):
        if axis_name:
            return jax.lax.all_gather(delta_l, axis_name, tiled=True)
        return delta_l

    if eliminate_velocities and not cg:
        dpose, dvel, dbias, g_dot_cam = _solve_vel_eliminated(
            bands, H_corr, g_corr, n, refine_iters, jitter
        )
        rhs = g_l - (V.T @ dpose).reshape(m_loc, LM_DIM)
        delta_l = jnp.einsum("mab,mb->ma", Hll_inv, rhs)
        g_dot_l = _psum(jnp.sum(g_l * delta_l))
        delta_l = _gather_lm(delta_l)
        frames = jnp.concatenate([dpose.reshape(n, POSE_DIM), dvel], axis=1)
        delta = jnp.concatenate(
            [frames.reshape(-1), dbias, delta_l.reshape(-1)]
        )
        if return_aux:
            return delta, g_dot_cam + g_dot_l
        return delta

    H_red, g_c_raw = expand_cam_dense(bands, pp_extra=-H_corr)
    g_c = jnp.concatenate(
        [g_c_raw[:pose_dim_total] - g_corr, g_c_raw[pose_dim_total:]]
    )

    if cg:
        delta_perm = _cg_solve(H_red, g_c, cg_iters, cg_tol)
    else:
        delta_perm = scaled_cho_solve(H_red, g_c, refine_iters, jitter)

    # Back-substitute landmarks: dl = Hll^-1 (g_l - V^T dpose).
    dpose = delta_perm[:pose_dim_total]
    rhs = g_l - (V.T @ dpose).reshape(m_loc, LM_DIM)
    delta_l = jnp.einsum("mab,mb->ma", Hll_inv, rhs)

    g_dot_l = _psum(jnp.sum(g_l * delta_l))
    delta_l = _gather_lm(delta_l)

    # Permute camera delta back to the global interleaved frame layout.
    dvel = delta_perm[pose_dim_total : pose_dim_total + 3 * n].reshape(n, 3)
    frames = jnp.concatenate([dpose.reshape(n, POSE_DIM), dvel], axis=1)
    delta_c = jnp.concatenate(
        [frames.reshape(-1), delta_perm[pose_dim_total + 3 * n :]]
    )
    delta = jnp.concatenate([delta_c, delta_l.reshape(-1)])
    if return_aux:
        # g.delta over the FULL (camera + landmark) system; the permuted
        # camera gradient pairs with the permuted camera delta, landmarks
        # pair blockwise. Damping never enters g.
        g_dot = g_c_raw @ delta_perm + g_dot_l
        return delta, g_dot
    return delta


def _solve_vel_eliminated(bands, H_corr, g_corr, n, refine_iters, jitter):
    """Eliminate the velocity chain, solve the (6N+6) pose+bias system,
    back-substitute velocities.

    The velocity block Avv is block-tridiagonal, but TPU-wise the right
    move is to IGNORE that structure: a lax.scan Thomas sweep costs ~50 us
    per step in loop overhead (~100 ms at N=1000 — measured), while the
    dense chol(3N) is ~1 ms of MXU time and the elimination becomes
    G = L^{-1} [Avp^T | Avb | gv] (one triangular solve with a wide MXU-
    batched right-hand side) followed by ONE symmetric matmul G^T G for
    every correction block at once. Velocity magnitudes span the IMU/DVL
    whitening range, so the block is Jacobi-scaled before factoring (same
    rationale as scaled_cho_solve) and gets the same guarded PD jitter as
    the reduced solve: vestigial under Marquardt damping with the lambda
    floor, but with identity damping an absolute lambda*I gives no
    relative PD margin and f32 rounding alone can tip the scaled Avv
    indefinite.

    Returns (dpose (6N,), dvel (N,3), dbias (6,), g.delta over the camera
    variables with the RAW gradients)."""
    from uslam_tpu.solvers.bands import _band_dense

    b = bands
    pose_total = POSE_DIM * n
    vel_total = VEL_DIM * n

    # Avp dense rows (3N, 6N): [v_k,p_k] = pv_d^T, [v_k,p_{k+1}] = pv_sub^T,
    # [v_{k+1},p_k] = pv_sup^T.
    Avp = _band_dense(
        b.pv_d.transpose(0, 2, 1),
        b.pv_sub.transpose(0, 2, 1),
        b.pv_sup.transpose(0, 2, 1),
    )
    R = jnp.concatenate(
        [Avp, b.vb.reshape(vel_total, BIAS_DIM), b.gv.reshape(vel_total, 1)],
        axis=1,
    )                                              # (3N, 6N+7)
    Avv = _band_dense(b.vv_d, b.vv_o, b.vv_o.transpose(0, 2, 1))
    dv_scale = jnp.sqrt(jnp.maximum(jnp.diag(Avv), 1e-20))
    dv_inv = 1.0 / dv_scale
    Avv_s = Avv * dv_inv[:, None] * dv_inv[None, :]
    # The velocity solve is refinement-free, so any jitter is a real bias.
    # Apply it only when the caller signals the no-floor regime (jitter >=
    # 1e-7 per lm.py's contract: identity damping, or diag damping with
    # the lambda floor disabled — there an absolute lambda*I gives no
    # relative PD margin and f32 rounding can tip the scaled Avv
    # indefinite). Under floored Marquardt damping the floor itself keeps
    # the damped scaled diagonal at >= 1 + 1e-7, so the vestigial 1e-8
    # jitter stays off Avv and clean-data step quality is unchanged.
    # Scaled by dtype eps so f64 equivalence tests stay exact to rounding.
    eps_ratio = jnp.finfo(Avv.dtype).eps / np.finfo(np.float32).eps
    avv_jitter = jitter if jitter >= 1e-7 else 0.0
    Avv_s = Avv_s + (avv_jitter * eps_ratio) * jnp.eye(vel_total, dtype=Avv.dtype)
    L = jnp.linalg.cholesky(Avv_s)

    def l_solve(x):
        return jax.scipy.linalg.solve_triangular(L, x * dv_inv[:, None], lower=True)

    G = l_solve(R)                                 # (3N, 6N+7)
    # Every elimination correction in ONE symmetric rank-3N matmul:
    # corr = R^T Avv^{-1} R = G^T G over [poses | bias | g].
    corr = jax.lax.dot_general(
        G, G, (((0,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )

    Hpp = (
        _band_dense(b.pp_d, b.pp_o, b.pp_o.transpose(0, 2, 1))
        - H_corr
        - corr[:pose_total, :pose_total]
    )
    Hpb = b.pb.reshape(pose_total, BIAS_DIM) - corr[:pose_total, pose_total:-1]
    Hbb = b.bb - corr[pose_total:-1, pose_total:-1]
    g_p = b.gp.reshape(-1) - g_corr - corr[:pose_total, -1]
    g_b = b.gb - corr[pose_total:-1, -1]

    H_red = jnp.concatenate(
        [
            jnp.concatenate([Hpp, Hpb], axis=1),
            jnp.concatenate([Hpb.T, Hbb], axis=1),
        ],
        axis=0,
    )
    sol = scaled_cho_solve(
        H_red, jnp.concatenate([g_p, g_b]), refine_iters, jitter
    )
    dpose, dbias = sol[:pose_total], sol[pose_total:]

    # dv = Avv^{-1}(gv - Avp dp - Avb db), reusing the factor: the forward
    # solves of all three terms are columns of G, so only the backward
    # substitution remains.
    y = G[:, -1] - G[:, :pose_total] @ dpose - G[:, pose_total:-1] @ dbias
    dvel = (
        jax.scipy.linalg.solve_triangular(L.T, y, lower=False) * dv_inv
    ).reshape(n, VEL_DIM)
    # g.delta over camera variables with RAW gradients (damping never
    # enters g; the U g_l and elimination corrections don't either).
    g_dot = (
        b.gp.reshape(-1) @ dpose
        + jnp.sum(b.gv * dvel)
        + b.gb @ dbias
    )
    return dpose, dvel, dbias, g_dot


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
