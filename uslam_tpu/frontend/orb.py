"""ORB keypoint extraction: grid-limited FAST+Harris, intensity-centroid
orientation, rotation-steered BRIEF descriptors.

Static-shape contract: every frame yields exactly
``grid_rows * grid_cols * max_features_per_cell`` keypoint slots
(mask marks real ones) — mirroring the nodelet's grid budget
(launch/stereo.launch:37-40: 3x4 grid, <=4 per cell) and giving jit a fixed
feature count (SURVEY.md §7 'Static shapes').

The rBRIEF sampling pattern is generated once from a fixed seed (clipped
Gaussian, the construction from the original BRIEF/ORB papers) — we do NOT
copy OpenCV's learned 256-pair table; matching quality is validated
behaviorally against OpenCV in tests instead of bit-for-bit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import FrontendConfig
from uslam_tpu.frontend.fast import fast_corners, harris_response, nms3
from uslam_tpu.frontend.pallas_kernels import resolve_pallas
from uslam_tpu.frontend.pyramid import box_blur, build_pyramid

# --- rBRIEF sampling pattern (fixed, deterministic) -----------------------

_PATTERN_BITS = 256
_PATCH_RADIUS = 18          # patch half-size for descriptor sampling
_EDGE_MARGIN = _PATCH_RADIUS + 1


def _make_pattern(bits: int = _PATTERN_BITS, seed: int = 42) -> np.ndarray:
    """(bits, 4) int8 offsets (y1, x1, y2, x2), Gaussian sigma = 13/2,
    clipped to +-13 (fits the rotated patch)."""
    rng = np.random.default_rng(seed)
    pts = np.clip(np.round(rng.normal(0.0, 6.5, size=(bits, 4))), -13, 13)
    return pts.astype(np.int8)


BRIEF_PATTERN = _make_pattern()


class Keypoints(NamedTuple):
    """Fixed-size keypoint set for one image."""

    xy: jnp.ndarray      # (K, 2) [x, y] level-0 pixel coords
    score: jnp.ndarray   # (K,) Harris response
    angle: jnp.ndarray   # (K,) radians
    level: jnp.ndarray   # (K,) int32 pyramid level
    desc: jnp.ndarray    # (K, 8) uint32 packed rBRIEF
    mask: jnp.ndarray    # (K,) bool


def _grid_topk(score_map: jnp.ndarray, valid: jnp.ndarray, rows: int, cols: int, per_cell: int):
    """Top-``per_cell`` scoring pixels per grid cell.

    Returns (ys, xs, scores, mask) each (rows*cols*per_cell,).
    """
    h, w = score_map.shape
    ch, cw = -(-h // rows), -(-w // cols)  # ceil
    ph, pw = ch * rows, cw * cols
    neg = jnp.asarray(-3.4e38, score_map.dtype)
    s = jnp.where(valid, score_map, neg)
    s = jnp.pad(s, ((0, ph - h), (0, pw - w)), constant_values=neg)
    cells = s.reshape(rows, ch, cols, cw).transpose(0, 2, 1, 3).reshape(rows * cols, ch * cw)
    vals, idx = jax.lax.top_k(cells, per_cell)          # (cells, per_cell)
    cy, cx = idx // cw, idx % cw
    r = jnp.arange(rows * cols)[:, None]
    ys = (r // cols) * ch + cy
    xs = (r % cols) * cw + cx
    mask = vals > neg * 0.5
    return ys.reshape(-1), xs.reshape(-1), vals.reshape(-1), mask.reshape(-1)


def _orientation(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch (K, P, P) -> (K,) radians.

    theta = atan2(m01, m10) over a circular window (standard ORB)."""
    P = patches.shape[-1]
    r = (P - 1) / 2.0
    ys = jnp.arange(P, dtype=patches.dtype) - r
    xs = ys
    yy = ys[:, None] * jnp.ones((1, P), patches.dtype)
    xx = jnp.ones((P, 1), patches.dtype) * xs[None, :]
    circ = (yy**2 + xx**2 <= r * r).astype(patches.dtype)
    m01 = jnp.sum(patches * yy * circ, axis=(-2, -1))
    m10 = jnp.sum(patches * xx * circ, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _rbrief(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF: rotate the sampling pattern by each keypoint's angle,
    sample (nearest-neighbor), compare, pack bits.

    patches: (K, P, P) blurred; angles: (K,). Returns (K, 8) uint32.
    """
    P = patches.shape[-1]
    c0 = (P - 1) // 2
    pat = jnp.asarray(BRIEF_PATTERN, jnp.float32)       # (256, 4) y1 x1 y2 x2
    ca, sa = jnp.cos(angles), jnp.sin(angles)           # (K,)

    # Steer the pattern with the patch: p' = R(theta) p, i.e.
    # x' = x cos - y sin ; y' = x sin + y cos  -> (K, 256) sample coords.
    def rotate(y, x):
        xr = x[None, :] * ca[:, None] - y[None, :] * sa[:, None]
        yr = x[None, :] * sa[:, None] + y[None, :] * ca[:, None]
        return yr, xr

    y1, x1, y2, x2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    y1r, x1r = rotate(y1, x1)
    y2r, x2r = rotate(y2, x2)

    def sample(yr, xr):
        iy = jnp.clip(jnp.round(yr).astype(jnp.int32) + c0, 0, P - 1)
        ix = jnp.clip(jnp.round(xr).astype(jnp.int32) + c0, 0, P - 1)
        return jax.vmap(lambda p, iy_, ix_: p[iy_, ix_])(patches, iy, ix)

    a = sample(y1r, x1r)
    b = sample(y2r, x2r)
    bits = (a < b).astype(jnp.uint32)                   # (K, 256)
    bits = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def _extract_patches(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, radius: int):
    """(K,) centers -> (K, 2r+1, 2r+1) patches via dynamic_slice (clamped)."""
    P = 2 * radius + 1
    h, w = img.shape

    def one(y, x):
        y0 = jnp.clip(y - radius, 0, h - P)
        x0 = jnp.clip(x - radius, 0, w - P)
        return jax.lax.dynamic_slice(img, (y0, x0), (P, P))

    return jax.vmap(one)(ys, xs)


@partial(jax.jit, static_argnames=("cfg",))
def extract_orb_batch(imgs: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> Keypoints:
    """ORB extraction over a batch of images (B, H, W) in ONE compiled call
    — e.g. both images of a stereo pair, halving dispatch overhead (the
    dominant cost on hosts with high device-call latency)."""
    return jax.vmap(lambda im: _extract_orb_impl(im, cfg))(imgs)


@partial(jax.jit, static_argnames=("cfg",))
def extract_orb(img: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> Keypoints:
    """Full ORB extraction on one grayscale image (H, W) float32.

    Multi-scale: detect + describe per pyramid level, then a global grid
    top-K over the union keeps the per-cell budget at level-0 resolution.
    """
    return _extract_orb_impl(img, cfg)


def _extract_orb_impl(img: jnp.ndarray, cfg: FrontendConfig) -> Keypoints:
    levels = build_pyramid(img, cfg.pyramid_levels)
    per_level = []
    K_cell = cfg.max_features_per_cell
    rows, cols = cfg.grid_rows, cfg.grid_cols

    use_pallas = resolve_pallas(cfg.use_pallas)
    for lvl, im in enumerate(levels):
        h, w = im.shape
        if use_pallas:
            from uslam_tpu.frontend.pallas_kernels import fast_harris_pallas

            corner_i, harris = fast_harris_pallas(im, cfg.fast_threshold)
            yy3 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xx3 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            corners = (
                (corner_i != 0)
                & (yy3 >= 3) & (yy3 < h - 3) & (xx3 >= 3) & (xx3 < w - 3)
            )
        else:
            corners = fast_corners(im, cfg.fast_threshold)
            harris = harris_response(im)
        # NMS among corner candidates only: non-corners must not suppress.
        masked_score = jnp.where(corners, harris, -3.4e38)
        valid = corners & nms3(masked_score)
        # Border margin so orientation/descriptor patches stay inside.
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inside = (
            (yy >= _EDGE_MARGIN) & (yy < h - _EDGE_MARGIN)
            & (xx >= _EDGE_MARGIN) & (xx < w - _EDGE_MARGIN)
        )
        ys, xs, scores, mask = _grid_topk(harris, valid & inside, rows, cols, K_cell)

        blurred = box_blur(im, 2)
        patches = _extract_patches(blurred, ys, xs, _PATCH_RADIUS)
        raw_patches = _extract_patches(im, ys, xs, _PATCH_RADIUS)
        angles = _orientation(raw_patches)
        desc = _rbrief(patches, angles)

        scale = 2.0**lvl
        per_level.append(
            Keypoints(
                xy=jnp.stack([xs.astype(jnp.float32) * scale, ys.astype(jnp.float32) * scale], -1),
                score=scores,
                angle=angles,
                level=jnp.full(ys.shape, lvl, jnp.int32),
                desc=desc,
                mask=mask,
            )
        )

    cand = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *per_level)

    # Global per-cell budget over the level union (cells at level-0 res).
    h0, w0 = img.shape
    ch, cw = -(-h0 // rows), -(-w0 // cols)
    cell = (cand.xy[:, 1] // ch).astype(jnp.int32) * cols + (
        cand.xy[:, 0] // cw
    ).astype(jnp.int32)
    neg = jnp.asarray(-3.4e38, cand.score.dtype)
    scores = jnp.where(cand.mask, cand.score, neg)

    picks = []
    for c in range(rows * cols):
        s_c = jnp.where(cell == c, scores, neg)
        _, idx = jax.lax.top_k(s_c, K_cell)
        picks.append(idx)
    sel = jnp.concatenate(picks)
    out = jax.tree.map(lambda a: a[sel], cand)
    return out._replace(mask=out.mask & (out.score[...] > neg * 0.5) & (scores[sel] > neg * 0.5))
