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


def box_sum(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 box SUM via separable shifted adds: 2(2r+1) full-image adds,
    pure VPU bandwidth, exact in f32 (an integral-image formulation loses
    ~7 digits on megapixel cumsums). Edge-replicate padding."""
    r = radius
    k = 2 * r + 1
    h, w = img.shape
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    rows = sum(x[i : i + h, :] for i in range(k))
    y = jnp.pad(rows, ((0, 0), (r, r)), mode="edge")
    return sum(y[:, j : j + w] for j in range(k))


def box_blur(img: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Box blur (the rBRIEF pre-smoothing; OpenCV ORB uses an
    integral-image box filter of similar support)."""
    k = 2 * radius + 1
    return box_sum(img, radius) / (k * k)
