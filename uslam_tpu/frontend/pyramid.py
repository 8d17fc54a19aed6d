"""Image pyramid + blur primitives.

The reference nodelet uses a 3-level pyramid for KLT (launch/stereo.launch:41
``pyramid_levels: 3``); here the pyramid feeds multi-scale FAST/ORB.
Images are (H, W) float32 grayscale in [0, 255].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool downsample (H and W must be even)."""
    h, w = img.shape
    return img.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """[level0 (full res), level1 (1/2), ...]."""
    out = [img]
    for _ in range(levels - 1):
        img = downsample2(img)
        out.append(img)
    return out


def box_blur(img: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Separable box blur (the rBRIEF pre-smoothing; OpenCV ORB uses an
    integral-image box filter of similar support)."""
    k = 2 * radius + 1
    kernel = jnp.ones((k,), img.dtype) / k
    # Separable: rows then cols, SAME padding via edge clamp.
    pad = [(radius, radius), (0, 0)]
    x = jnp.pad(img, pad, mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=1, out_axes=1)(x)
    pad = [(0, 0), (radius, radius)]
    x = jnp.pad(x, pad, mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(x)
    return x
