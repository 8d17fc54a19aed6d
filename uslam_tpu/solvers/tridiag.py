"""Block-tridiagonal SPD solve (blocked Thomas algorithm) as two scans.

The velocity chain of the camera normal equations is block-tridiagonal
(IMU interval k couples v_k to v_{k+1}; DVL observes each v_k directly), so
eliminating the velocities onto the poses needs Avv^{-1} applied against a
wide right-hand side. On TPU this maps to two ``lax.scan`` sweeps whose
per-step work is a (3,3) inverse plus (3,3)@(3,K) matmuls batched over the
K right-hand sides — sequential in N but with trivial per-step latency,
instead of a 3N x 3N dense factorization.

Replaces the corresponding portion of the sparse elimination GTSAM's
multifrontal solver performs for the reference (batch.py:337), reshaped
for the TPU: a fixed elimination order that turns the chain structure into
batched small matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_tridiag_solve(
    diag: jnp.ndarray, off: jnp.ndarray, rhs: jnp.ndarray, unroll: int = 8
) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal system A x = rhs.

    diag: (N, d, d) diagonal blocks; off: (N-1, d, d) with A[k, k+1] =
    off[k] (and A[k+1, k] = off[k]^T); rhs: (N, d, K). Returns (N, d, K).

    Blocked Thomas: forward sweep carries T_k = D_k - C_k^T T_{k-1}^{-1} C_k
    (the per-block Schur complements) and the forward-substituted
    right-hand side; backward sweep back-substitutes. Stable without
    pivoting for SPD systems.
    """
    n, d, _ = diag.shape
    off_padded = jnp.concatenate([jnp.zeros((1, d, d), diag.dtype), off], axis=0)

    def fwd(carry, inp):
        t_inv_prev, u_prev = carry
        d_k, c_k, r_k = inp                      # c_k = off[k-1] (zero at k=0)
        z = r_k - c_k.T @ u_prev
        t_k = d_k - c_k.T @ (t_inv_prev @ c_k)
        t_inv = jnp.linalg.inv(t_k)
        u = t_inv @ z
        return (t_inv, u), (t_inv, u)

    init = (jnp.zeros((d, d), diag.dtype), jnp.zeros((d, rhs.shape[-1]), rhs.dtype))
    _, (t_inv, u) = jax.lax.scan(
        fwd, init, (diag, off_padded, rhs), unroll=unroll
    )

    def bwd(x_next, inp):
        t_inv_k, u_k, off_k = inp                # off_k = off[k] (zero at k=N-1)
        x_k = u_k - t_inv_k @ (off_k @ x_next)
        return x_k, x_k

    off_tail = jnp.concatenate([off, jnp.zeros((1, d, d), diag.dtype)], axis=0)
    _, x = jax.lax.scan(
        bwd,
        jnp.zeros((d, rhs.shape[-1]), rhs.dtype),
        (t_inv, u, off_tail),
        reverse=True,
        unroll=unroll,
    )
    return x


def _thomas_batched(diag, off, rhs, unroll: int = 2):
    """SPD blocked Thomas, batched over an extra axis with the SCAN axis
    leading: diag (T, C, d, d), off (T-1, C, d, d), rhs (T, C, d, K).
    Each scan step reads one contiguous (C, d, K) slab and does batched
    (C,d,d)@(C,d,K) matmuls — the layout that keeps the Spike chunk solves
    off the strided-gather path."""
    t_len, c, d, _ = diag.shape
    off_p = jnp.concatenate([jnp.zeros((1, c, d, d), diag.dtype), off], axis=0)

    def fwd(carry, inp):
        t_inv_prev, u_prev = carry
        d_k, c_k, r_k = inp
        c_t = c_k.transpose(0, 2, 1)
        z = r_k - c_t @ u_prev
        t_k = d_k - c_t @ (t_inv_prev @ c_k)
        t_inv = jnp.linalg.inv(t_k)
        u = t_inv @ z
        return (t_inv, u), (t_inv, u)

    init = (
        jnp.zeros((c, d, d), diag.dtype),
        jnp.zeros((c, d, rhs.shape[-1]), rhs.dtype),
    )
    _, (t_inv, u) = jax.lax.scan(fwd, init, (diag, off_p, rhs), unroll=unroll)

    off_t = jnp.concatenate([off, jnp.zeros((1, c, d, d), diag.dtype)], axis=0)

    def bwd(x_next, inp):
        t_inv_k, u_k, off_k = inp
        x_k = u_k - t_inv_k @ (off_k @ x_next)
        return x_k, x_k

    _, x = jax.lax.scan(
        bwd, init[1], (t_inv, u, off_t), reverse=True, unroll=unroll
    )
    return x


def _thomas_general(diag, sub, sup, rhs, unroll: int = 4):
    """Unsymmetric block-tridiagonal Thomas: A[k,k]=diag[k],
    A[k+1,k]=sub[k], A[k,k+1]=sup[k]. Shapes (N,d,d)/(N-1,d,d)/(N,d,K)."""
    n, d, _ = diag.shape
    z = jnp.zeros((1, d, d), diag.dtype)
    sub_p = jnp.concatenate([z, sub], axis=0)

    def fwd(carry, inp):
        t_inv_prev, u_prev = carry
        d_k, lo_k, hi_prev, r_k = inp
        zt = r_k - lo_k @ u_prev
        t_k = d_k - lo_k @ (t_inv_prev @ hi_prev)
        t_inv = jnp.linalg.inv(t_k)
        u = t_inv @ zt
        return (t_inv, u), (t_inv, u)

    sup_p = jnp.concatenate([z, sup], axis=0)      # sup[k-1] aligned to row k
    init = (jnp.zeros((d, d), diag.dtype), jnp.zeros((d, rhs.shape[-1]), rhs.dtype))
    _, (t_inv, u) = jax.lax.scan(fwd, init, (diag, sub_p, sup_p, rhs), unroll=unroll)

    sup_t = jnp.concatenate([sup, z], axis=0)

    def bwd(x_next, inp):
        t_inv_k, u_k, hi_k = inp
        x_k = u_k - t_inv_k @ (hi_k @ x_next)
        return x_k, x_k

    _, x = jax.lax.scan(
        bwd, jnp.zeros((d, rhs.shape[-1]), rhs.dtype), (t_inv, u, sup_t),
        reverse=True, unroll=unroll,
    )
    return x


def block_tridiag_solve_spike(
    diag: jnp.ndarray, off: jnp.ndarray, rhs: jnp.ndarray, chunk: int = 16
) -> jnp.ndarray:
    """SPD block-tridiagonal solve by the Spike (partitioned Thomas)
    algorithm — the TPU-friendly variant of :func:`block_tridiag_solve`.

    A length-N sequential Thomas sweep costs ~N small-op latencies; here the
    chain splits into C = ceil(N/chunk) chunks solved INDEPENDENTLY (the
    in-chunk Thomas scans are vmapped over chunks, so each of the `chunk`
    scan steps is one batched MXU matmul), a small 6x6-block reduced system
    couples the chunk boundaries (sequential, but only C steps), and a
    batched combine recovers the interior. Sequential depth drops from
    2N to ~2(chunk + C) (~1000 -> ~160 at N=1000, chunk=16).

    Chunk systems are principal submatrices of an SPD matrix — SPD
    themselves, so the in-chunk Thomas needs no pivoting.
    """
    n, d, _ = diag.shape
    k_rhs = rhs.shape[-1]
    c = -(-n // chunk)
    n_pad = c * chunk
    dtype = diag.dtype

    # Pad the chain with decoupled identity blocks (off = 0 into padding).
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (n_pad - n, d, d))
    diag_p = jnp.concatenate([diag, eye], axis=0)
    off_full = jnp.concatenate(
        [off, jnp.zeros((n_pad - n + 1, d, d), dtype)], axis=0
    )                                              # off_full[k] couples k,k+1
    rhs_p = jnp.concatenate(
        [rhs, jnp.zeros((n_pad - n, d, k_rhs), dtype)], axis=0
    )

    # Per-chunk views. In-chunk couplings exclude the boundary links.
    diag_c = diag_p.reshape(c, chunk, d, d)
    rhs_c = rhs_p.reshape(c, chunk, d, k_rhs)
    # off within chunk c: global indices [c*chunk, (c+1)*chunk - 2]
    idx = (jnp.arange(c)[:, None] * chunk) + jnp.arange(chunk - 1)[None, :]
    off_in = off_full[idx.reshape(-1)].reshape(c, chunk - 1, d, d)
    # boundary coupling C_c = off[(c+1)*chunk - 1] (zero for the last chunk).
    bnd = off_full[(jnp.arange(c) + 1) * chunk - 1]          # (C, d, d)

    # Solve each chunk against [rhs | e_first | e_last] in one batched
    # Thomas (columns d..2d-1: unit block on the first row; 2d..: last row).
    e_cols = jnp.zeros((c, chunk, d, 2 * d), dtype)
    e_cols = e_cols.at[:, 0, :, :d].set(jnp.eye(d, dtype=dtype))
    e_cols = e_cols.at[:, -1, :, d:].set(jnp.eye(d, dtype=dtype))
    big_rhs = jnp.concatenate([rhs_c, e_cols], axis=-1)

    sol = _thomas_batched(
        diag_c.transpose(1, 0, 2, 3),              # scan-major: (chunk, C, ...)
        off_in.transpose(1, 0, 2, 3),
        big_rhs.transpose(1, 0, 2, 3),
    ).transpose(1, 0, 2, 3)                        # (C, chunk, d, K+2d)
    x_loc = sol[..., :k_rhs]
    v_spk = sol[..., k_rhs : k_rhs + d]            # A_c^{-1} e_first
    w_spk = sol[..., k_rhs + d :]                  # A_c^{-1} e_last

    # Reduced block-tridiagonal system in z_c = [a_c; b_c] (first/last row
    # values of chunk c), 2d x 2d blocks:
    #   z_c + L_c z_{c-1} + U_c z_{c+1} = [x_loc first; x_loc last]
    bnd_prev_T = jnp.concatenate(
        [jnp.zeros((1, d, d), dtype), bnd[:-1].transpose(0, 2, 1)], axis=0
    )                                              # C_{c-1}^T per chunk
    zblk = jnp.zeros((c, d, d), dtype)
    L_c = jnp.concatenate(
        [
            jnp.concatenate([zblk, v_spk[:, 0] @ bnd_prev_T], axis=-1),
            jnp.concatenate([zblk, v_spk[:, -1] @ bnd_prev_T], axis=-1),
        ],
        axis=-2,
    )                                              # (C, 2d, 2d)
    U_c = jnp.concatenate(
        [
            jnp.concatenate([w_spk[:, 0] @ bnd, zblk], axis=-1),
            jnp.concatenate([w_spk[:, -1] @ bnd, zblk], axis=-1),
        ],
        axis=-2,
    )
    eye2 = jnp.broadcast_to(jnp.eye(2 * d, dtype=dtype), (c, 2 * d, 2 * d))
    red_rhs = jnp.concatenate([x_loc[:, 0], x_loc[:, -1]], axis=-2)  # (C,2d,K)
    z = _thomas_general(eye2, L_c[1:], U_c[:-1], red_rhs)
    a_c, b_c = z[:, :d], z[:, d:]

    # Combine: x_c = x_loc - V_c C_{c-1}^T b_{c-1} - W_c C_c a_{c+1}.
    b_prev = jnp.concatenate([jnp.zeros((1, d, k_rhs), dtype), b_c[:-1]], axis=0)
    a_next = jnp.concatenate([a_c[1:], jnp.zeros((1, d, k_rhs), dtype)], axis=0)
    corr_l = jnp.einsum("cab,cbk->cak", bnd_prev_T, b_prev)
    corr_r = jnp.einsum("cab,cbk->cak", bnd, a_next)
    x = (
        x_loc
        - jnp.einsum("ctab,cbk->ctak", v_spk, corr_l)
        - jnp.einsum("ctab,cbk->ctak", w_spk, corr_r)
    )
    return x.reshape(n_pad, d, k_rhs)[:n]
