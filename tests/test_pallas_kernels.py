"""Pallas kernels vs their XLA oracles (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from uslam_tpu.frontend.fast import fast_corners, harris_response
from uslam_tpu.frontend.match import hamming_distance_matrix
from uslam_tpu.frontend.pallas_kernels import (
    fast_harris_pallas,
    hamming_matrix_pallas,
)
from tests.test_frontend import textured_image

RNG = np.random.default_rng(7)


def interior_mask(h, w, margin=4):
    m = np.zeros((h, w), bool)
    m[margin:-margin, margin:-margin] = True
    return m


class TestFastHarrisPallas:
    def test_matches_xla(self):
        img = jnp.asarray(textured_image(160, 256))
        corner_p, harris_p = fast_harris_pallas(img, 10.0, tile_h=64, interpret=True)
        corner_x = fast_corners(img, 10.0)
        harris_x = harris_response(img)
        m = interior_mask(160, 256, margin=5)
        np.testing.assert_array_equal(
            np.asarray(corner_p).astype(bool)[m], np.asarray(corner_x)[m]
        )
        hp, hx = np.asarray(harris_p)[m], np.asarray(harris_x)[m]
        scale = np.abs(hx).max() + 1e-9
        np.testing.assert_allclose(hp / scale, hx / scale, atol=2e-5)

    def test_non_tile_multiple_height(self):
        img = jnp.asarray(textured_image(100, 128))
        corner_p, _ = fast_harris_pallas(img, 10.0, tile_h=64, interpret=True)
        corner_x = fast_corners(img, 10.0)
        m = interior_mask(100, 128, margin=5)
        np.testing.assert_array_equal(
            np.asarray(corner_p).astype(bool)[m], np.asarray(corner_x)[m]
        )


class TestHammingPallas:
    def test_matches_xla(self):
        da = jnp.asarray(RNG.integers(0, 2**32, (70, 8), dtype=np.uint32))
        db = jnp.asarray(RNG.integers(0, 2**32, (130, 8), dtype=np.uint32))
        ours = hamming_matrix_pallas(da, db, tile=64, interpret=True)
        ref = hamming_distance_matrix(da, db)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_extract_orb_pallas_path_matches():
    """use_pallas=True (interpret mode on CPU) gives identical keypoints."""
    import jax.numpy as jnp
    from uslam_tpu.config import FrontendConfig
    from uslam_tpu.frontend.orb import extract_orb

    img = jnp.asarray(textured_image(128, 256))
    k_x = extract_orb(img, FrontendConfig(pyramid_levels=1))
    k_p = extract_orb(img, FrontendConfig(pyramid_levels=1, use_pallas=True))
    np.testing.assert_array_equal(np.asarray(k_x.mask), np.asarray(k_p.mask))
    np.testing.assert_array_equal(np.asarray(k_x.xy), np.asarray(k_p.xy))
    np.testing.assert_array_equal(np.asarray(k_x.desc), np.asarray(k_p.desc))


def test_fast_harris_batched_and_vmap():
    """(B, H, W) batched grid == vmap over single images == single calls.

    extract_orb_batch vmaps the whole extraction; the custom_vmap rule must
    route that through the natively batched (batch, tile) grid instead of
    trying to batch the pallas_call (Mosaic rejects batched ANY operands)."""
    import jax

    base = jnp.asarray(textured_image(96, 256))
    imgs = jnp.stack([base, base[::-1, ::-1]])
    cb, hb = fast_harris_pallas(imgs, 10.0, interpret=True)
    cv, hv = jax.vmap(lambda im: fast_harris_pallas(im, 10.0, interpret=True))(imgs)
    np.testing.assert_array_equal(np.asarray(cb), np.asarray(cv))
    np.testing.assert_allclose(np.asarray(hb), np.asarray(hv))
    for b in range(2):
        c1, h1 = fast_harris_pallas(imgs[b], 10.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(cb[b]), np.asarray(c1))
        np.testing.assert_allclose(np.asarray(hb[b]), np.asarray(h1))


def test_extract_orb_batch_pallas_matches():
    """The production batched stereo extraction with use_pallas on."""
    import jax.numpy as jnp
    from uslam_tpu.config import FrontendConfig
    from uslam_tpu.frontend.orb import extract_orb_batch

    pair = jnp.stack([jnp.asarray(textured_image(128, 256))] * 2)
    k_x = extract_orb_batch(pair, FrontendConfig(pyramid_levels=1))
    k_p = extract_orb_batch(pair, FrontendConfig(pyramid_levels=1, use_pallas=True))
    np.testing.assert_array_equal(np.asarray(k_x.mask), np.asarray(k_p.mask))
    np.testing.assert_array_equal(np.asarray(k_x.xy), np.asarray(k_p.xy))
    np.testing.assert_array_equal(np.asarray(k_x.desc), np.asarray(k_p.desc))
