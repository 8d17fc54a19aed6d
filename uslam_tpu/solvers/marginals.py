"""Marginal covariance recovery at a solution (GTSAM ``Marginals`` parity).

The reference's factor-graph engine (GTSAM, SURVEY.md C19) exposes
``gtsam.Marginals(graph, values).marginalCovariance(key)``; the reference
scripts never call it, but it is a standard capability of the engine being
replaced, and it is what turns a point estimate into a usable state
estimate (landmark quality gating, pose uncertainty ellipsoids, data
association gates).

TPU formulation — selected-column solves against the Schur-reduced camera
system, never a full dense inverse:

- Let ``H = [[A, W], [W^T, D]]`` be the (whitened, undamped) normal
  equations over camera states ``c = [poses(6N) | vels(3N) | bias(6)]``
  (pose-major, the layout of :func:`expand_cam_dense`) and landmarks.
- Camera marginals are blocks of ``S^{-1}`` with
  ``S = A - W D^{-1} W^T`` — the same reduced matrix the production solver
  factors; requested blocks come from one multi-RHS scaled-Cholesky solve
  ``S X = E`` (unit columns at the requested rows).
- Landmark marginals use the block-inverse identity
  ``Sigma_jj = D_j^{-1} + U_j^T S^{-1} U_j`` with ``U = W D^{-1}`` — the
  very stacks :func:`landmark_elimination` already produces; the
  ``S^{-1} U_j`` factors ride the same multi-RHS solve.

One Cholesky factorization of S + one triangular-solve batch recovers any
number of requested marginals; FLOPs are the same as one LM iteration.

The f32 caveat mirrors the solver's: weakly-observable global modes make S
ill-conditioned, so covariances of far-from-anchor states carry the f32
assembly noise of those modes. Tests pin the f64 path to a dense-inverse
oracle exactly and check the f32 path on well-conditioned entries.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.geometry.camera import StereoCamera
from uslam_tpu.graph.builder import GraphArrays
from uslam_tpu.graph.values import BIAS_DIM, LM_DIM, POSE_DIM, VEL_DIM, Values
from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense
from uslam_tpu.solvers.dense import _add_diag
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.solvers.schur import landmark_elimination


class MarginalCovariances(NamedTuple):
    """Requested marginal covariance blocks, in request order.

    ``pose`` blocks are over the SE3 retract tangent (rot(3), trans(3) —
    the order of ``values_retract``); ``vel``/``landmark`` are plain R^3;
    ``bias`` is [accel(3), gyro(3)].
    """

    pose: jnp.ndarray        # (P, 6, 6)
    vel: jnp.ndarray         # (V, 3, 3)
    landmark: jnp.ndarray    # (L, 3, 3)
    bias: jnp.ndarray | None  # (6, 6) or None


def _scaled_cho_solve_mat(H, B, refine_iters: int, jitter: float):
    """scaled_cho_solve with a matrix right-hand side (D, K)."""
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-20))
    d_inv = 1.0 / d
    Hs = H * d_inv[:, None] * d_inv[None, :]
    L = jnp.linalg.cholesky(_add_diag(Hs, jitter))

    def tri_solve(b):
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    bs = B * d_inv[:, None]
    x = tri_solve(bs)
    for _ in range(refine_iters):
        x = x + tri_solve(bs - Hs @ x)
    return x * d_inv[:, None]


def marginal_covariances(
    graph: GraphArrays,
    values: Values,
    cam: StereoCamera,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    pose_indices: Sequence[int] = (),
    vel_indices: Sequence[int] = (),
    landmark_indices: Sequence[int] = (),
    include_bias: bool = False,
    jitter: float | None = None,
    refine_iters: int = 4,
) -> MarginalCovariances:
    """Marginal covariances of selected states at ``values``.

    ``values`` should be a converged estimate (the covariance is the
    inverse curvature of the whitened least-squares objective there —
    GTSAM ``Marginals`` semantics, reference batch.py:337's engine).
    Index sequences are static Python ints (they shape the program).
    Fully jittable for fixed index tuples.

    ``jitter=None`` resolves per dtype: 1e-7 in f64 (negligible against
    the oracle tolerances), 1e-5 in f32 — the UNDAMPED reduced system's
    weak modes sit below f32 Cholesky roundoff (scaled min eig measured
    -8e-9 against eps*||Hs|| ~ 3e-7 on a small unconverged graph), so the
    solver-safe 1e-7 can produce a NaN factor here where the LM solver,
    protected by its lambda damping, survives. The refinement passes solve
    against the UNJITTERED operator, so the extra jitter bias is removed
    to first order.
    """
    pose_indices = tuple(int(i) for i in pose_indices)
    vel_indices = tuple(int(i) for i in vel_indices)
    landmark_indices = tuple(int(j) for j in landmark_indices)
    n = values.num_poses
    pose_total = POSE_DIM * n
    dtype = values.pose_trans.dtype
    if jitter is None:
        jitter = 1e-7 if dtype == jnp.float64 else 1e-5

    lin = linearize_graph(
        graph, values, cam, dvl_sigma, stereo_sigma, gravity
    )
    # damping=0: both helpers keep their vestigial 1e-8 diagonal floor,
    # which is ~1e-14 relative on these whitened systems — negligible
    # against the jitter+refinement armor.
    Hll_inv, _g_l, U, _V = landmark_elimination(lin, graph.stereo, n, 0.0)
    bands = assemble_cam_bands(lin, graph.stereo, n, 0.0)
    H_corr = jax.lax.dot_general(
        U, _V, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGH
    )
    S, _g = expand_cam_dense(bands, pp_extra=-H_corr)
    Dc = S.shape[0]

    # ---- right-hand-side columns -----------------------------------------
    cols = []
    for i in pose_indices:
        E = jnp.zeros((Dc, POSE_DIM), dtype)
        cols.append(E.at[POSE_DIM * i + jnp.arange(POSE_DIM), jnp.arange(POSE_DIM)].set(1.0))
    for i in vel_indices:
        E = jnp.zeros((Dc, VEL_DIM), dtype)
        off = pose_total + VEL_DIM * i
        cols.append(E.at[off + jnp.arange(VEL_DIM), jnp.arange(VEL_DIM)].set(1.0))
    if include_bias:
        E = jnp.zeros((Dc, BIAS_DIM), dtype)
        off = pose_total + VEL_DIM * n
        cols.append(E.at[off + jnp.arange(BIAS_DIM), jnp.arange(BIAS_DIM)].set(1.0))
    for j in landmark_indices:
        # S^{-1} U_j needs U_j zero-padded onto the full camera layout
        # (W couples landmarks to poses only).
        Uj = jax.lax.dynamic_slice(U, (0, LM_DIM * j), (pose_total, LM_DIM))
        cols.append(jnp.pad(Uj, ((0, Dc - pose_total), (0, 0))))

    if not cols:
        z3 = jnp.zeros((0, 3, 3), dtype)
        return MarginalCovariances(
            jnp.zeros((0, 6, 6), dtype), z3, z3, None
        )

    B = jnp.concatenate(cols, axis=1)
    X = _scaled_cho_solve_mat(S, B, refine_iters, jitter)

    # ---- slice the requested blocks back out -----------------------------
    off = 0
    pose_blocks = []
    for i in pose_indices:
        pose_blocks.append(
            jax.lax.dynamic_slice(X, (POSE_DIM * i, off), (POSE_DIM, POSE_DIM))
        )
        off += POSE_DIM
    vel_blocks = []
    for i in vel_indices:
        vel_blocks.append(
            jax.lax.dynamic_slice(
                X, (pose_total + VEL_DIM * i, off), (VEL_DIM, VEL_DIM)
            )
        )
        off += VEL_DIM
    bias_block = None
    if include_bias:
        boff = pose_total + VEL_DIM * n
        bias_block = jax.lax.dynamic_slice(X, (boff, off), (BIAS_DIM, BIAS_DIM))
        off += BIAS_DIM
    lm_blocks = []
    for j in landmark_indices:
        Xj = jax.lax.dynamic_slice(X, (0, off), (pose_total, LM_DIM))
        Uj = jax.lax.dynamic_slice(U, (0, LM_DIM * j), (pose_total, LM_DIM))
        lm_blocks.append(Hll_inv[j] + Uj.T @ Xj)
        off += LM_DIM

    def stack(blocks, d):
        if not blocks:
            return jnp.zeros((0, d, d), dtype)
        return jnp.stack(blocks)

    def symm(M):
        return 0.5 * (M + jnp.swapaxes(M, -1, -2))

    return MarginalCovariances(
        pose=symm(stack(pose_blocks, POSE_DIM)),
        vel=symm(stack(vel_blocks, VEL_DIM)),
        landmark=symm(stack(lm_blocks, LM_DIM)),
        bias=None if bias_block is None else symm(bias_block),
    )


def joint_marginal_covariance(
    graph: GraphArrays,
    values: Values,
    cam: StereoCamera,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    keys: Sequence[tuple],
    jitter: float | None = None,
    refine_iters: int = 4,
) -> jnp.ndarray:
    """Full JOINT covariance over a set of states (GTSAM
    ``Marginals::jointMarginalCovariance`` parity — needed for data
    association gating and cross-state consistency checks, the one engine
    capability :func:`marginal_covariances`'s per-variable blocks miss).

    ``keys``: sequence of ``("pose", i)``, ``("vel", i)``, ``("bias",)``,
    ``("landmark", j)`` (static Python values — they shape the program).
    Returns the dense (D, D) covariance over the concatenated tangents in
    request order (pose keys contribute 6 rows [rot(3), trans(3)], vel /
    landmark 3, bias 6).

    Same machinery as the per-variable recovery: with
    ``H = [[A, W], [W^T, D]]`` and ``S = A - W D^{-1} W^T``,

        H^{-1} = [[S^{-1},         -S^{-1} U       ],
                  [-U^T S^{-1},    D^{-1} + U^T S^{-1} U]],   U = W D^{-1}

    so every requested block rides ONE multi-RHS solve against the reduced
    camera system (unit columns for camera states, ``U_j`` columns for
    landmarks).
    """
    keys = tuple(
        (k[0], int(k[1])) if len(k) > 1 else (k[0],) for k in keys
    )
    n = values.num_poses
    pose_total = POSE_DIM * n
    dtype = values.pose_trans.dtype
    # Same dtype-resolved default as marginal_covariances (f32 needs the
    # larger PD margin on the undamped system; refinement removes the bias).
    if jitter is None:
        jitter = 1e-7 if dtype == jnp.float64 else 1e-5

    lin = linearize_graph(graph, values, cam, dvl_sigma, stereo_sigma, gravity)
    Hll_inv, _g_l, U, _V = landmark_elimination(lin, graph.stereo, n, 0.0)
    bands = assemble_cam_bands(lin, graph.stereo, n, 0.0)
    H_corr = jax.lax.dot_general(
        U, _V, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGH
    )
    S, _g = expand_cam_dense(bands, pp_extra=-H_corr)
    Dc = S.shape[0]

    def key_info(k):
        """(kind, camera-layout row offset or landmark index, tangent dim)."""
        if k[0] == "pose":
            return ("cam", POSE_DIM * k[1], POSE_DIM)
        if k[0] == "vel":
            return ("cam", pose_total + VEL_DIM * k[1], VEL_DIM)
        if k[0] == "bias":
            return ("cam", pose_total + VEL_DIM * n, BIAS_DIM)
        if k[0] == "landmark":
            return ("lm", k[1], LM_DIM)
        raise ValueError(f"unknown marginal key kind {k[0]!r}")

    infos = [key_info(k) for k in keys]
    cols = []
    for kind, off, d in infos:
        if kind == "cam":
            E = jnp.zeros((Dc, d), dtype)
            cols.append(E.at[off + jnp.arange(d), jnp.arange(d)].set(1.0))
        else:
            Uj = jax.lax.dynamic_slice(U, (0, LM_DIM * off), (pose_total, LM_DIM))
            cols.append(jnp.pad(Uj, ((0, Dc - pose_total), (0, 0))))
    B = jnp.concatenate(cols, axis=1)
    X = _scaled_cho_solve_mat(S, B, refine_iters, jitter)

    col_offs = np.concatenate([[0], np.cumsum([d for _, _, d in infos])])
    Dt = int(col_offs[-1])

    rows_out = []
    for a, (kind_a, off_a, da) in enumerate(infos):
        row_blocks = []
        for b, (kind_b, off_b, db) in enumerate(infos):
            Xb = jax.lax.dynamic_slice(X, (0, int(col_offs[b])), (Dc, db))
            if kind_a == "cam":
                blk = jax.lax.dynamic_slice(Xb, (off_a, 0), (da, db))
                if kind_b == "lm":
                    blk = -blk                      # top-right: -S^{-1} U
            else:
                Ua = jax.lax.dynamic_slice(
                    U, (0, LM_DIM * off_a), (pose_total, LM_DIM)
                )
                if kind_b == "cam":
                    # bottom-left: -U^T S^{-1} = (top-right)^T.
                    blk = -(Ua.T @ Xb[:pose_total])
                else:
                    blk = Ua.T @ Xb[:pose_total]    # U_a^T S^{-1} U_b
                    if off_a == off_b:
                        blk = blk + Hll_inv[off_a]  # + D^{-1} on the diagonal
            row_blocks.append(blk)
        rows_out.append(jnp.concatenate(row_blocks, axis=1))
    J = jnp.concatenate(rows_out, axis=0)
    assert J.shape == (Dt, Dt)
    return 0.5 * (J + J.T)


def marginal_sigmas(cov_blocks: jnp.ndarray) -> np.ndarray:
    """Per-axis marginal standard deviations from stacked covariance
    blocks — the usual ellipsoid-axis summary."""
    d = np.asarray(jnp.diagonal(cov_blocks, axis1=-2, axis2=-1))
    return np.sqrt(np.maximum(d, 0.0))
