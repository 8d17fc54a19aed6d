"""Pallas TPU kernels for the front-end hot ops.

Two kernels, each with the pure-XLA implementation in :mod:`fast`/:mod:`match`
as its oracle (tests run both in interpreter mode on CPU and compare):

- ``fast_harris_pallas``: fused FAST-9 corner test + Harris response over
  row tiles. The XLA version materializes 16 shifted image copies in HBM
  (~16x HBM traffic at 1920x1080); here each row tile is DMA'd to VMEM once
  (with a 3-row halo) and all 16 ring comparisons, the arc test, Sobel
  gradients and the Harris window run out of VMEM — one HBM read, two
  writes.
- ``hamming_matrix_pallas``: tiled XOR+popcount distance matrix with SWAR
  popcount (no native popcount dependency), MXU-free pure VPU work.

Hardware notes (pallas_guide.md): tiles keep the last dim = image width
(multiple of 128 for realistic cameras; padded otherwise), f32 sublane 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uslam_tpu.frontend.fast import FAST_RING

_HALO = 3  # FAST ring radius; also covers Sobel(1) + part of Harris window


def resolve_pallas(flag) -> bool:
    """Resolve FrontendConfig.use_pallas: "auto" -> True iff the default
    backend is a real TPU (kernels profiled faster there; interpret-mode
    Pallas on CPU is orders of magnitude slower than the XLA paths)."""
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return bool(flag)


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on uint32 (works on any substrate, incl. Mosaic)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


# --------------------------------------------------------------------------
# Fused FAST + Harris
# --------------------------------------------------------------------------

# Interior row offset inside a slab. The algorithm needs 7 halo rows
# (FAST ring 3 + Harris window 3 + Sobel 1); 8 keeps every HBM DMA slice
# 8-row aligned (f32 sublane tiling — Mosaic rejects unaligned slices) and
# makes slab_h = tile_h + 16 a sublane multiple.
_OFF = 8


def _hroll(x: jnp.ndarray, dx: int) -> jnp.ndarray:
    """jnp.roll(x, -dx, axis=1) via pltpu.roll (which wants shift >= 0)."""
    w = x.shape[1]
    return pltpu.roll(x, (-dx) % w, axis=1)


def _fast_harris_kernel(img_hbm, corner_ref, harris_ref, *, threshold, tile_h, k):
    """One (batch, row-tile) grid cell. The full padded image batch stays in
    HBM/ANY; the tile plus a +-_OFF row halo is DMA'd into a VMEM slab
    (overlapping windows are not expressible with blocked BlockSpecs), then
    every stage runs from VMEM."""
    batch_id = pl.program_id(0)
    tile_id = pl.program_id(1)
    W = img_hbm.shape[2]
    slab_h = tile_h + 2 * _OFF

    def body(slab_ref, sem):
        dma = pltpu.make_async_copy(
            img_hbm.at[batch_id, pl.ds(tile_id * tile_h, slab_h), :], slab_ref, sem
        )
        dma.start()
        dma.wait()
        slab = slab_ref[:]
        off = _OFF

        def centered(dy, dx):
            rows = slab[off + dy : off + dy + tile_h, :]
            return _hroll(rows, dx)

        center = slab[off : off + tile_h, :]
        hi = center + threshold
        lo = center - threshold
        bright = jnp.zeros((tile_h, W), jnp.int32)
        dark = jnp.zeros((tile_h, W), jnp.int32)
        for b, (dy, dx) in enumerate(FAST_RING):
            p = centered(dy, dx)
            bright = bright | ((p > hi).astype(jnp.int32) << b)
            dark = dark | ((p < lo).astype(jnp.int32) << b)

        def arc9(bits):
            x = bits | (bits << 16)
            r2 = x & (x >> 1)
            r4 = r2 & (r2 >> 2)
            r8 = r4 & (r4 >> 4)
            return ((r8 & (x >> 8)) & 0xFFFF) != 0

        corner_ref[0] = (arc9(bright) | arc9(dark)).astype(jnp.int32)

        # Sobel gradients over the (tile_h + 6)-row band the 7x7 Harris
        # window reaches, then separable box sums.
        g_rows = tile_h + 6
        g_off = off - 3

        def sl(dy, dx):
            rows = slab[g_off + dy : g_off + dy + g_rows, :]
            return _hroll(rows, dx)

        gx = (
            (sl(-1, 1) - sl(-1, -1))
            + 2.0 * (sl(0, 1) - sl(0, -1))
            + (sl(1, 1) - sl(1, -1))
        )
        gy = (
            (sl(1, -1) - sl(-1, -1))
            + 2.0 * (sl(1, 0) - sl(-1, 0))
            + (sl(1, 1) - sl(-1, 1))
        )
        xx, yy, xy = gx * gx, gy * gy, gx * gy

        def box7(a):
            acc = jnp.zeros((tile_h, W), a.dtype)
            for dy in range(7):
                acc = acc + a[dy : dy + tile_h, :]
            out = jnp.zeros_like(acc)
            for dx in range(-3, 4):
                out = out + _hroll(acc, dx)
            return out

        sxx, syy, sxy = box7(xx), box7(yy), box7(xy)
        det = sxx * syy - sxy * sxy
        tr = sxx + syy
        harris_ref[0] = det - k * tr * tr

    pl.run_scoped(
        body,
        pltpu.VMEM((slab_h, W), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


def _fast_harris_batched(imgs: jnp.ndarray, threshold: float, k: float,
                         tile_h: int, interpret: bool):
    """(B, H, W) -> (corner (B, H, W) int32, harris (B, H, W) f32) with a
    (batch, row-tile) grid — ONE pallas_call for a whole image batch (the
    stereo pair / frame window), so the batched extraction path never
    vmaps over a pallas_call (Mosaic can't batch an ANY-space operand)."""
    nb, h, w = imgs.shape
    tile_h = min(tile_h, max(8, h))
    pad_h = (-h) % tile_h
    # Mosaic requires HBM slice widths aligned to the 128-lane tiling.
    pad_w = (-w) % 128
    # Top/bottom halo + tile alignment; edge-replicated values only reach
    # pixels the interior mask discards anyway.
    img_p = jnp.pad(imgs, ((0, 0), (_OFF, _OFF + pad_h), (0, pad_w)), mode="edge")
    n_tiles = (h + pad_h) // tile_h
    wp = w + pad_w

    kernel = functools.partial(
        _fast_harris_kernel, threshold=threshold, tile_h=tile_h, k=k
    )
    corner, harris = pl.pallas_call(
        kernel,
        grid=(nb, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, tile_h, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, h + pad_h, wp), jnp.int32),
            jax.ShapeDtypeStruct((nb, h + pad_h, wp), jnp.float32),
        ),
        interpret=interpret,
    )(img_p)
    return corner[:, :h, :w], harris[:, :h, :w]


@functools.lru_cache(maxsize=None)
def _fast_harris_fn(threshold: float, k: float, tile_h: int, interpret: bool):
    """Single-image entry with a custom vmap rule: ``jax.vmap`` over it
    (e.g. extract_orb_batch's stereo pair) dispatches to the natively
    batched grid instead of trying to batch the pallas_call itself."""

    def single(img):
        c, hr = _fast_harris_batched(img[None], threshold, k, tile_h, interpret)
        return c[0], hr[0]

    cv = jax.custom_batching.custom_vmap(single)

    @cv.def_vmap
    def _rule(axis_size, in_batched, imgs):  # noqa: ANN001
        out = _fast_harris_batched(imgs, threshold, k, tile_h, interpret)
        return out, (True, True)

    return cv


def fast_harris_pallas(
    img: jnp.ndarray, threshold: float, k: float = 0.04, tile_h: int = 64,
    interpret: bool | None = None,
):
    """Fused FAST-9 corner mask + Harris response.

    Accepts (H, W) or a batch (B, H, W). Returns (corner int32, harris f32)
    matching the input rank; caller applies the 3px interior mask exactly
    like :func:`fast.fast_corners`. vmap-safe (custom batching rule).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if img.ndim == 3:
        return _fast_harris_batched(img, float(threshold), k, tile_h, bool(interpret))
    return _fast_harris_fn(float(threshold), float(k), int(tile_h), bool(interpret))(img)


# --------------------------------------------------------------------------
# Hamming distance matrix
# --------------------------------------------------------------------------

def _hamming_kernel(a_ref, b_ref, out_ref):
    """a: (TA, 8) uint32; b: (TB, 8) uint32; out: (TA, TB) int32."""
    a = a_ref[:]
    b = b_ref[:]
    acc = jnp.zeros((a.shape[0], b.shape[0]), jnp.int32)
    for widx in range(a.shape[1]):
        x = jnp.bitwise_xor(a[:, widx : widx + 1], b[:, widx : widx + 1].T)
        acc = acc + _popcount32(x)
    out_ref[:] = acc


def hamming_matrix_pallas(
    da: jnp.ndarray, db: jnp.ndarray, tile: int = 128, interpret: bool | None = None
) -> jnp.ndarray:
    """(Na, 8) x (Nb, 8) uint32 -> (Na, Nb) int32, tiled over both axes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    na, w = da.shape
    nb = db.shape[0]
    pa, pb = (-na) % tile, (-nb) % tile
    da_p = jnp.pad(da, ((0, pa), (0, 0)))
    db_p = jnp.pad(db, ((0, pb), (0, 0)))
    out = pl.pallas_call(
        _hamming_kernel,
        grid=((na + pa) // tile, (nb + pb) // tile),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((na + pa, nb + pb), jnp.int32),
        interpret=interpret,
    )(da_p, db_p)
    return out[:na, :nb]
