"""Dense normal-equations assembly and Gauss-Newton solve.

The reference hands its graph to GTSAM LM backed by SuiteSparse sparse
factorization (batch.py:337). On TPU the small-problem path is simpler: one
scatter-add assembled dense Hessian and a Cholesky solve — all MXU work.
This is the test/verification solver; the production path is the Schur
solver (:mod:`uslam_tpu.solvers.schur`).

Tangent layout (graph/values.py): [frame_0(9) ... frame_{N-1}(9) | bias(6) |
lm_0(3) ...]; each frame block is [pose(6), vel(3)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, LM_DIM, POSE_DIM
from uslam_tpu.graph.values import VEL_DIM as VEL_DIM_
from uslam_tpu.solvers.linearize import Linearization


def inv3x3(A):
    """Closed-form (adjugate/cofactor) inverse of batched 3x3 matrices.

    ``jnp.linalg.inv`` on a batched (M, 3, 3) operand lowers to a batched
    LU that measures ~25 ms per call on this TPU *independent of M* (LU's
    sequential pivoting serializes); the cofactor expansion is pure
    elementwise VPU work at ~0.3 ms for M=512 / ~2 ms for M=4096. It sits
    once per LM iteration in both landmark-elimination hot paths
    (schur.py / banded.py), where the operands are damped SPD 3x3 blocks
    (diagonal floor 1e-8 keeps padded landmarks' determinants positive
    and representable in f32: det >= 1e-24). The raw cofactor expansion
    agrees with LU only to ~2e-4 relative in f32 — enough to shift the
    LM accept/reject luck on small clean problems by ~25% ATE (measured:
    tests/test_solver.py clean-data pin went 0.11 -> 0.137 when the raw
    form replaced LU) — so one Newton step X <- X (2I - A X) follows (two
    batched 3x3 matmuls, still VPU-cheap), which quadratically squares
    the residual to ~1e-7 relative and restores LU-grade step quality.

    f32 entry-magnitude assumption: adj/det has no pivot-based scaling, so
    block entries must stay below ~1e12 or det (~entries^3) overflows f32
    to inf and the result silently degrades to a zero inverse. Whitened
    stereo Jacobians put Hll entries at ~1e6 (det ~1e18, comfortably
    finite); callers introducing new weighting should keep that headroom
    or run under SolverConfig.debug_nans.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    C00 = e * i - f * h
    C01 = c * h - b * i
    C02 = b * f - c * e
    C10 = f * g - d * i
    C11 = a * i - c * g
    C12 = c * d - a * f
    C20 = d * h - e * g
    C21 = b * g - a * h
    C22 = a * e - b * d
    det = a * C00 + b * C10 + c * C20
    adj = jnp.stack(
        [
            jnp.stack([C00, C01, C02], -1),
            jnp.stack([C10, C11, C12], -1),
            jnp.stack([C20, C21, C22], -1),
        ],
        -2,
    )
    X = adj / det[..., None, None]
    # One Newton-Schulz step: ||I - A X'|| ~= ||I - A X||^2 (~2e-4 -> 1e-7).
    # Precision pinned HIGHEST explicitly: under TPU's default bf16 matmul
    # passes this "refinement" would carry ~4e-3 error — worse than the raw
    # cofactor inverse it corrects — so correctness must not depend on the
    # caller's default_matmul_precision context.
    eye = jnp.eye(3, dtype=A.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(
        X, 2.0 * eye - jnp.matmul(A, X, precision=hi), precision=hi
    )


def _block_rows(off, d):
    """(F,) offsets + block dim -> (F, d) row indices."""
    return off[:, None] + jnp.arange(d)[None, :]


def scatter_H(H, off_a, off_b, blocks):
    """H[off_a:off_a+da, off_b:off_b+db] += blocks, batched over factors.

    off_a/off_b: (F,) int; blocks: (F, da, db).
    """
    da, db = blocks.shape[-2], blocks.shape[-1]
    rows = _block_rows(off_a, da)[:, :, None]          # (F, da, 1)
    cols = _block_rows(off_b, db)[:, None, :]          # (F, 1, db)
    rows = jnp.broadcast_to(rows, blocks.shape)
    cols = jnp.broadcast_to(cols, blocks.shape)
    return H.at[rows, cols].add(blocks)


def scatter_g(g, off, vecs):
    """g[off:off+d] += vecs, batched. off: (F,), vecs: (F, d)."""
    return g.at[_block_rows(off, vecs.shape[-1])].add(vecs)


def assemble_dense(
    lin: Linearization, num_poses: int, num_landmarks: int, pose_major: bool = False
):
    """Build (H, g) = (J^T J, -J^T r) over the full tangent space.

    ``pose_major=True`` lays the camera part out as
    [pose_0..pose_{N-1} (6 each) | vel_0..vel_{N-1} (3 each) | bias(6)]
    instead of interleaved 9-dim frames — the Schur solver uses this so the
    landmark correction lands on one contiguous (6N, 6N) block (a single
    matmul instead of a 75M-element scatter; see schur.py).
    """
    n, m = num_poses, num_landmarks
    D = FRAME_DIM * n + BIAS_DIM + LM_DIM * m
    if pose_major:
        pose_off = lambda k: POSE_DIM * k          # noqa: E731
        vel_off = lambda k: POSE_DIM * n + VEL_DIM_ * k  # noqa: E731
        bias_off = FRAME_DIM * n
    else:
        pose_off = lambda k: FRAME_DIM * k         # noqa: E731
        vel_off = lambda k: FRAME_DIM * k + POSE_DIM  # noqa: E731
        bias_off = FRAME_DIM * n
    lm_base = FRAME_DIM * n + BIAS_DIM
    dtype = lin.stereo_r.dtype
    H = jnp.zeros((D, D), dtype)
    g = jnp.zeros(D, dtype)

    def add_single(H, g, off, d, J, r):
        H = H.at[off : off + d, off : off + d].add(J.T @ J)
        g = g.at[off : off + d].add(-J.T @ r)
        return H, g

    # Priors (single factors on frame 0 / bias).
    H, g = add_single(H, g, pose_off(0), POSE_DIM, lin.prior_pose_J, lin.prior_pose_r)
    H, g = add_single(H, g, vel_off(0), 3, lin.prior_vel_J, lin.prior_vel_r)
    H, g = add_single(H, g, bias_off, BIAS_DIM, lin.prior_bias_J, lin.prior_bias_r)

    # Dense marginal prior on [pose_0(6), vel_0(3), bias(6)] (fixed-lag).
    Jm, rm = lin.marg_J, lin.marg_r
    m_offs = (pose_off(0), vel_off(0), bias_off)
    m_dims = (POSE_DIM, VEL_DIM_, BIAS_DIM)
    col0 = (0, POSE_DIM, POSE_DIM + VEL_DIM_)
    for a in range(3):
        Ja = Jm[:, col0[a] : col0[a] + m_dims[a]]
        g = g.at[m_offs[a] : m_offs[a] + m_dims[a]].add(-Ja.T @ rm)
        for b in range(3):
            Jb = Jm[:, col0[b] : col0[b] + m_dims[b]]
            H = H.at[
                m_offs[a] : m_offs[a] + m_dims[a], m_offs[b] : m_offs[b] + m_dims[b]
            ].add(Ja.T @ Jb)

    # IMU: intervals k couple frames (k, k+1) + bias.
    k = jnp.arange(lin.imu_r.shape[0])
    offs = {
        "pi": pose_off(k),
        "vi": vel_off(k),
        "pj": pose_off(k + 1),
        "vj": vel_off(k + 1),
        "b": jnp.full_like(k, bias_off),
    }
    Js = {
        "pi": lin.imu_J_pose_i,
        "vi": lin.imu_J_vel_i,
        "pj": lin.imu_J_pose_j,
        "vj": lin.imu_J_vel_j,
        "b": lin.imu_J_bias,
    }
    names = list(Js)
    for a in names:
        g = scatter_g(g, offs[a], -jnp.einsum("fda,fd->fa", Js[a], lin.imu_r))
        for b in names:
            blocks = jnp.einsum("fda,fdb->fab", Js[a], Js[b])
            H = scatter_H(H, offs[a], offs[b], blocks)

    # DVL: per-frame (pose, vel).
    i = jnp.arange(lin.dvl_r.shape[0])
    p_off, v_off = pose_off(i), vel_off(i)
    g = scatter_g(g, p_off, -jnp.einsum("fda,fd->fa", lin.dvl_J_pose, lin.dvl_r))
    g = scatter_g(g, v_off, -jnp.einsum("fda,fd->fa", lin.dvl_J_vel, lin.dvl_r))
    H = scatter_H(H, p_off, p_off, jnp.einsum("fda,fdb->fab", lin.dvl_J_pose, lin.dvl_J_pose))
    H = scatter_H(H, p_off, v_off, jnp.einsum("fda,fdb->fab", lin.dvl_J_pose, lin.dvl_J_vel))
    H = scatter_H(H, v_off, p_off, jnp.einsum("fda,fdb->fab", lin.dvl_J_vel, lin.dvl_J_pose))
    H = scatter_H(H, v_off, v_off, jnp.einsum("fda,fdb->fab", lin.dvl_J_vel, lin.dvl_J_vel))

    return H, g, lm_base


def assemble_dense_with_landmarks(
    lin: Linearization, cam_idx, lm_idx, num_poses: int, num_landmarks: int
):
    """Full dense (H, g) including stereo factors and landmark blocks."""
    H, g, lm_base = assemble_dense(lin, num_poses, num_landmarks)
    p_off = FRAME_DIM * cam_idx
    l_off = lm_base + LM_DIM * lm_idx
    g = scatter_g(g, p_off, -jnp.einsum("fda,fd->fa", lin.stereo_J_pose, lin.stereo_r))
    g = scatter_g(g, l_off, -jnp.einsum("fda,fd->fa", lin.stereo_J_lm, lin.stereo_r))
    H = scatter_H(H, p_off, p_off, jnp.einsum("fda,fdb->fab", lin.stereo_J_pose, lin.stereo_J_pose))
    H = scatter_H(H, p_off, l_off, jnp.einsum("fda,fdb->fab", lin.stereo_J_pose, lin.stereo_J_lm))
    H = scatter_H(H, l_off, p_off, jnp.einsum("fda,fdb->fab", lin.stereo_J_lm, lin.stereo_J_pose))
    H = scatter_H(H, l_off, l_off, jnp.einsum("fda,fdb->fab", lin.stereo_J_lm, lin.stereo_J_lm))
    return H, g


def _add_diag(H: jnp.ndarray, v) -> jnp.ndarray:
    """H + v*I without materializing an eye or scattering (both slow on
    TPU): one fused elementwise pass with a broadcast iota equality mask."""
    D = H.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    return jnp.where(i == j, H + v, H)


def scaled_cho_solve(
    H: jnp.ndarray,
    g: jnp.ndarray,
    refine_iters: int = 4,
    jitter: float = 1e-7,
) -> jnp.ndarray:
    """Cholesky solve with symmetric Jacobi scaling + iterative refinement.

    Default jitter is the SAFE 1e-7 (PD even when the system carries no
    relative diagonal boost — e.g. identity damping with a small absolute
    lambda; 1e-8 measurably NaNs there). The production LM path passes the
    vestigial 1e-8 explicitly because Marquardt damping with the lambda
    floor already supplies the 1e-7 margin (SolverConfig.cholesky_jitter,
    guarded in solvers.lm).

    The whitened normal equations span ~8 orders of magnitude on the
    diagonal (IMU whitening vs landmark blocks); factoring
    D^-1/2 H D^-1/2 (unit diagonal) keeps every pivot O(1) so f32 Cholesky
    never goes negative from rounding. This is what lets the whole solver
    stay in f32 on the MXU instead of needing f64.

    The jitter that keeps the f32 factorization PD acts as permanent
    damping on weakly-observable directions (scaled eigenvalues below the
    jitter: the near-gauge global modes); Richardson refinement with the
    jittered factor removes that bias at rate jit/(mu+jit) per pass. The
    LM outer loop crawls along exactly those weak modes, so step quality
    here sets the outer iteration count — (jitter 1e-6, 3 passes) needs 26
    outer iterations on the 200-pose problem where (1e-7, 10 passes) needs
    9 and reaches a LOWER final error (tools/solver_lab.py; the f64-exact
    oracle needs 6). The scaled system's true negative eigenvalues measure
    ~-8e-9 (f32 assembly rounding), so 1e-7 keeps Cholesky safely PD while
    biasing an order of magnitude less than 1e-6. Preconditioned CG in
    place of Richardson is NOT safe here: those slightly-negative modes
    make f32 CG blow up (measured, tools/lm_trace.py).

    The extra tri-solve pairs are cheap next to the factorization
    (~2.2 ms/pair vs 22 ms chol at D=9006 on v5e).
    """
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-20))
    d_inv = 1.0 / d
    Hs = H * d_inv[:, None] * d_inv[None, :]
    # Relative jitter, applied with a fused broadcast-iota mask:
    # materializing eye(D) and adding it costs ~9 ms at D=9006 on v5e.
    Hj = _add_diag(Hs, jitter)
    # XLA's native Cholesky lowering, deliberately: a hand-rolled blocked
    # right-looking factorization (512-wide panels, one MXU SYRK per step)
    # measured SLOWER end-to-end (53.9x vs 61.7x realtime on the 1k-pose
    # bench), and bf16 trailing updates NaN on these normal equations
    # (scaled eigenvalues reach the jitter floor).
    L = jnp.linalg.cholesky(Hj)

    def tri_solve(b):
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    bs = g * d_inv
    x = tri_solve(bs)
    for _ in range(refine_iters):
        x = x + tri_solve(bs - Hs @ x)
    return x * d_inv


def solve_dense_gn(
    H: jnp.ndarray,
    g: jnp.ndarray,
    damping: jnp.ndarray | float = 0.0,
    refine_iters: int = 4,
    jitter: float = 1e-7,
    diag_damping: bool = False,
):
    """Solve (H + lambda I) delta = g — or (H + lambda diag(H)) with
    ``diag_damping`` (Marquardt scaling, see assemble_cam_bands) — by
    scaled Cholesky.

    A tiny diagonal floor keeps unconstrained padding rows (masked factors)
    nonsingular without perturbing constrained directions.
    """
    damp = damping * jnp.diag(H) if diag_damping else damping
    return scaled_cho_solve(_add_diag(H, damp + 1e-8), g, refine_iters, jitter)
