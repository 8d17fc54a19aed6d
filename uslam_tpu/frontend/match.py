"""Brute-force Hamming matching: temporal and stereo.

Replaces the nodelet's KLT tracking + stereo matching
(launch/stereo.launch:41-47) with descriptor matching, per the north star.
The distance matrix is XOR + popcount over packed uint32 descriptors —
``jax.lax.population_count`` maps to native VPU ops; a Pallas-tiled variant
lives in :mod:`pallas_kernels` for large sets.

Match policy: mutual nearest neighbor + Lowe ratio test + absolute distance
gate. Stereo adds the rectified-epipolar gate |vL - vR| <= tol and a
positive-disparity gate (stereo_match threshold 5 px in the reference
config, launch/stereo.launch:47).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 20)


def hamming_distance_matrix(
    da: jnp.ndarray, db: jnp.ndarray, use_pallas: bool = False
) -> jnp.ndarray:
    """(Na, W) x (Nb, W) packed uint32 -> (Na, Nb) int32 Hamming distance."""
    if use_pallas:
        from uslam_tpu.frontend.pallas_kernels import hamming_matrix_pallas

        return hamming_matrix_pallas(da, db)
    x = jnp.bitwise_xor(da[:, None, :], db[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


class Matches(NamedTuple):
    """Fixed-size (Na,) match result: for each row of A, the matched column
    of B (or -1) and the distance."""

    idx: jnp.ndarray    # (Na,) int32 into B, -1 = unmatched
    dist: jnp.ndarray   # (Na,) int32
    mask: jnp.ndarray   # (Na,) bool


def _mutual_ratio_match(
    dist: jnp.ndarray,
    mask_a: jnp.ndarray,
    mask_b: jnp.ndarray,
    max_distance: int,
    ratio: float,
) -> Matches:
    dist = jnp.where(mask_a[:, None] & mask_b[None, :], dist, BIG)
    na, nb = dist.shape

    best_j = jnp.argmin(dist, axis=1)                       # (Na,)
    best_d = jnp.take_along_axis(dist, best_j[:, None], 1)[:, 0]
    # Second best for the ratio test.
    masked = dist.at[jnp.arange(na), best_j].set(BIG)
    second_d = jnp.min(masked, axis=1)
    # Mutual check: is i also the best row for column best_j?
    best_i_per_col = jnp.argmin(dist, axis=0)               # (Nb,)
    mutual = best_i_per_col[best_j] == jnp.arange(na)

    ok = (
        mutual
        & (best_d <= max_distance)
        & (best_d.astype(jnp.float32) <= ratio * second_d.astype(jnp.float32))
        & mask_a
    )
    return Matches(jnp.where(ok, best_j, -1), best_d, ok)


def match_descriptors(
    desc_a: jnp.ndarray,
    mask_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    mask_b: jnp.ndarray,
    max_distance: int = 64,
    ratio: float = 0.8,
    use_pallas: bool = False,
) -> Matches:
    """Temporal matching A (current) -> B (previous)."""
    return _mutual_ratio_match(
        hamming_distance_matrix(desc_a, desc_b, use_pallas),
        mask_a, mask_b, max_distance, ratio,
    )


def stereo_match(
    desc_l: jnp.ndarray,
    xy_l: jnp.ndarray,
    mask_l: jnp.ndarray,
    desc_r: jnp.ndarray,
    xy_r: jnp.ndarray,
    mask_r: jnp.ndarray,
    max_distance: int = 64,
    ratio: float = 0.8,
    max_v_diff: float = 5.0,
    min_disparity: float = 0.25,
    max_disparity: float = 512.0,
    use_pallas: bool = False,
) -> Matches:
    """Left->right matching on a rectified pair.

    Gates: row agreement |vL - vR| <= max_v_diff (stereo.launch:47 uses
    5 px), disparity uL - uR in (min_disparity, max_disparity).
    """
    dist = hamming_distance_matrix(desc_l, desc_r, use_pallas)
    d_v = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    geom = (d_v <= max_v_diff) & (disp > min_disparity) & (disp < max_disparity)
    dist = jnp.where(geom, dist, BIG)
    return _mutual_ratio_match(dist, mask_l, mask_r, max_distance, ratio)
