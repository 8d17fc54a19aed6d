"""Pyramidal Lucas-Kanade (KLT) feature tracking.

The reference nodelet tracks features with pyramidal KLT
(launch/stereo.launch:41-43: pyramid_levels 3, patch_size 15,
max_iteration 30, track_precision 0.01). The north-star design replaces
KLT with ORB matching (frontend/match.py) — this module provides KLT as
well so both temporal-association strategies exist
(``FrontendConfig``-selectable via the tracker).

Fully vectorized: bilinear sampling gathers, per-keypoint 2x2 Gauss-Newton
systems, a ``lax.scan`` over iterations with converged-freeze masking, a
static Python loop over pyramid levels — one jit program, no data-dependent
shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from uslam_tpu.frontend.pyramid import build_pyramid


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img at float coords (broadcasted y, x)."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(x), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    p00 = img[y0i, x0i]
    p01 = img[y0i, x0i + 1]
    p10 = img[y0i + 1, x0i]
    p11 = img[y0i + 1, x0i + 1]
    return (
        p00 * (1 - fy) * (1 - fx)
        + p01 * (1 - fy) * fx
        + p10 * fy * (1 - fx)
        + p11 * fy * fx
    )


def _track_level(
    prev_im: jnp.ndarray,
    next_im: jnp.ndarray,
    pts_prev: jnp.ndarray,   # (K, 2) [x, y] at this level
    guess: jnp.ndarray,      # (K, 2) current displacement estimate
    radius: int,
    iters: int,
    precision: float,
):
    """One pyramid level of LK for all keypoints. Returns (flow, valid)."""
    win = 2 * radius + 1
    dy = jnp.arange(-radius, radius + 1, dtype=prev_im.dtype)
    dx = dy
    oy = jnp.repeat(dy, win)
    ox = jnp.tile(dx, win)

    def per_point(pt, g0):
        px, py = pt[0], pt[1]
        ys = py + oy
        xs = px + ox
        # Template + spatial gradients from the previous image (fixed).
        T = _bilinear(prev_im, ys, xs)
        Ix = 0.5 * (_bilinear(prev_im, ys, xs + 1.0) - _bilinear(prev_im, ys, xs - 1.0))
        Iy = 0.5 * (_bilinear(prev_im, ys + 1.0, xs) - _bilinear(prev_im, ys - 1.0, xs))
        Gxx = jnp.sum(Ix * Ix)
        Gxy = jnp.sum(Ix * Iy)
        Gyy = jnp.sum(Iy * Iy)
        det = Gxx * Gyy - Gxy * Gxy
        ok_G = det > 1e-6
        inv_det = jnp.where(ok_G, 1.0 / jnp.maximum(det, 1e-12), 0.0)

        def body(carry, _):
            v, frozen = carry
            I = _bilinear(next_im, ys + v[1], xs + v[0])
            d = T - I
            bx = jnp.sum(d * Ix)
            by = jnp.sum(d * Iy)
            dvx = inv_det * (Gyy * bx - Gxy * by)
            dvy = inv_det * (-Gxy * bx + Gxx * by)
            step = jnp.array([dvx, dvy])
            small = jnp.linalg.norm(step) < precision
            v_new = jnp.where(frozen, v, v + step)
            return (v_new, frozen | small), None

        (v, _), _ = jax.lax.scan(body, (g0, ~ok_G), None, length=iters)

        h, w = next_im.shape
        tx, ty = px + v[0], py + v[1]
        inb = (
            (tx >= radius) & (tx < w - radius) & (ty >= radius) & (ty < h - radius)
        )
        return v, ok_G & inb

    return jax.vmap(per_point)(pts_prev, guess)


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def klt_track(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pts: jnp.ndarray,            # (K, 2) [x, y] full-res coords
    mask: jnp.ndarray,           # (K,) bool
    levels: int = 3,
    radius: int = 7,             # patch_size 15 => radius 7 (stereo.launch:44)
    iters: int = 30,             # stereo.launch:42
    precision: float = 0.01,     # stereo.launch:43
):
    """Track points from prev_img to next_img.

    Returns (new_pts (K, 2), valid (K,)). Coarse-to-fine over ``levels``.
    """
    prev_pyr = build_pyramid(prev_img, levels)
    next_pyr = build_pyramid(next_img, levels)

    k = pts.shape[0]
    flow = jnp.zeros((k, 2), prev_img.dtype)
    valid = mask
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        pts_l = pts / scale
        v, ok = _track_level(
            prev_pyr[lvl], next_pyr[lvl], pts_l, flow / scale,
            radius, iters, precision,
        )
        flow = v * scale
        valid = valid & ok
    return pts + flow, valid
