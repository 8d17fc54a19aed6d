"""FAST-9 corner detection + Harris scoring — fully vectorized.

Replaces the nodelet's grid FAST detector (launch/stereo.launch:37-44:
FAST threshold 10, grid 3x4, <=4 features/cell). The classic pointer-chasing
FAST implementation is replaced by a whole-image bit-trick formulation that
the VPU eats: 16 shifted copies of the image produce per-pixel bright/dark
bitmasks; a contiguous arc of >= 9 is tested with 4 shift-AND reductions.

Harris response (the nodelet's ``fast_threshold`` companion scoring; OpenCV
ORB's HARRIS_SCORE) ranks detections; computed with separable gradient/box
convolutions — all MXU/VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (the FAST-16 ring), (dy, dx), clockwise from
# 12 o'clock — the standard ordering.
FAST_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so that out[y, x] = img[y+dy, x+dx] (edge-padded)."""
    return jnp.roll(img, (-dy, -dx), axis=(0, 1))


def _arc9(bits: jnp.ndarray) -> jnp.ndarray:
    """True where the 16-bit ring mask contains >= 9 contiguous set bits
    (circularly). bits: int32 with low 16 bits used."""
    x = bits | (bits << 16)  # unwrap the circle
    r2 = x & (x >> 1)        # runs of 2
    r4 = r2 & (r2 >> 2)      # runs of 4
    r8 = r4 & (r4 >> 4)      # runs of 8
    r9 = r8 & (x >> 8)       # runs of 9
    return (r9 & 0xFFFF) != 0


def fast_corners(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Boolean corner map, same shape as img.

    A pixel is a corner iff >= 9 contiguous ring pixels are all brighter
    than center+t or all darker than center-t (FAST-9). Border of 3 px is
    masked out (the ring would wrap).
    """
    h, w = img.shape
    bright = jnp.zeros(img.shape, jnp.int32)
    dark = jnp.zeros(img.shape, jnp.int32)
    hi = img + threshold
    lo = img - threshold
    for i, (dy, dx) in enumerate(FAST_RING):
        p = _shift(img, dy, dx)
        bright = bright | ((p > hi).astype(jnp.int32) << i)
        dark = dark | ((p < lo).astype(jnp.int32) << i)
    corner = _arc9(bright) | _arc9(dark)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return corner & interior


def harris_response(img: jnp.ndarray, block: int = 7, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response R = det(M) - k tr(M)^2 with Sobel gradients
    and a block x block summation window (OpenCV HarrisResponses uses
    block 7 for ORB).

    Implemented as shifted adds (VPU bandwidth) rather than 1-channel 2-D
    convolutions, which map poorly onto the MXU. Values within ``block``/2+1
    pixels of the border are garbage (wrap/pad mix) — detection masks the
    border anyway.
    """
    from uslam_tpu.frontend.pyramid import box_sum

    s = _shift
    gx = (
        (s(img, -1, 1) - s(img, -1, -1))
        + 2.0 * (s(img, 0, 1) - s(img, 0, -1))
        + (s(img, 1, 1) - s(img, 1, -1))
    )
    gy = (
        (s(img, 1, -1) - s(img, -1, -1))
        + 2.0 * (s(img, 1, 0) - s(img, -1, 0))
        + (s(img, 1, 1) - s(img, -1, 1))
    )
    r = block // 2
    sxx = box_sum(gx * gx, r)
    syy = box_sum(gy * gy, r)
    sxy = box_sum(gx * gy, r)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression mask: True where score is the strict
    local max of its 8-neighborhood."""
    is_max = jnp.ones(score.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            is_max = is_max & (score >= _shift(score, dy, dx))
    return is_max
