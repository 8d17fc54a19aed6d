"""Pyramidal KLT tracker tests (the reference nodelet's tracking method,
stereo.launch:41-44 parameters)."""

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import shift as nd_shift

from uslam_tpu.frontend.klt import klt_track
from tests.test_frontend import textured_image


def test_recovers_translation():
    img = textured_image(192, 256, seed=9)
    d = (3.6, -2.3)  # (dx, dy), subpixel
    img2 = nd_shift(img, (d[1], d[0]), order=1, mode="nearest")
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(30, 226, 32), rng.uniform(30, 162, 32)], axis=-1
    ).astype(np.float32)
    mask = jnp.ones(32, bool)
    new_pts, valid = klt_track(
        jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts), mask
    )
    flows = np.asarray(new_pts) - pts
    v = np.asarray(valid)
    assert v.sum() >= 20, v.sum()
    err = np.abs(flows[v] - np.array(d))
    # Most tracked points recover the shift to subpixel accuracy.
    assert np.median(err[:, 0]) < 0.3 and np.median(err[:, 1]) < 0.3, (
        np.median(err, axis=0),
    )


def test_large_motion_needs_pyramid():
    img = textured_image(192, 256, seed=10)
    d = 14.0  # beyond the 7px radius at level 0; pyramid must catch it
    img2 = nd_shift(img, (0, d), order=1, mode="nearest")
    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.uniform(40, 210, 24), rng.uniform(40, 150, 24)], axis=-1
    ).astype(np.float32)
    mask = jnp.ones(24, bool)
    new_pts, valid = klt_track(
        jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts), mask, levels=3
    )
    flows = np.asarray(new_pts) - pts
    v = np.asarray(valid)
    good = np.abs(flows[v, 0] - d) < 1.0
    assert v.sum() >= 12
    assert good.mean() > 0.5, (good.mean(), np.median(flows[v, 0]))


def test_invalid_in_flat_regions():
    img = np.full((96, 128), 100.0, np.float32)  # no texture anywhere
    pts = np.array([[64.0, 48.0], [30.0, 30.0]], np.float32)
    _, valid = klt_track(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(pts), jnp.ones(2, bool)
    )
    assert not bool(np.asarray(valid).any())


def test_tracker_klt_mode_persistent_ids():
    """StereoFrontend with temporal_tracker='klt' keeps ids across frames."""
    from uslam_tpu.config import CameraConfig, FrontendConfig
    from uslam_tpu.frontend.tracker import StereoFrontend

    cam = CameraConfig(resolution_x=256, resolution_y=192)
    cfg = FrontendConfig(temporal_tracker="klt", klt_gate_px=2.5)
    fe = StereoFrontend(cam, cfg)
    img = textured_image()
    disp = 8.0
    frames = []
    for step in range(3):
        left = nd_shift(img, (0, 3 * step), order=1, mode="nearest")
        right = nd_shift(left, (0, -disp), order=1, mode="nearest")
        frames.append(fe.process(left, right, t=0.2 * step))
    assert len(frames[0].ids) >= 8
    common = np.intersect1d(frames[0].ids, frames[1].ids)
    assert len(common) >= 3, (len(common), len(frames[0].ids), len(frames[1].ids))
